import json

import pytest

from ppl.llm.serving_tpu.config import (
    ConfigError, GeneratorConfig, ModelConfig, ResourceConfig,
)

PARAMS = {
    "num_heads": 32,
    "num_kv_heads": 4,
    "num_layers": 22,
    "hidden_dim": 2048,
    "intermediate_dim": 5632,
    "vocab_size": 32000,
    "cache_quant_bit": 8,
    "cache_quant_group": 8,
    "cache_layout": 0,
    "cache_mode": 1,
    "page_size": 128,
    "dynamic_batching": True,
    "auto_causal": True,
}


def _write(tmp_path, doc):
    p = tmp_path / "params.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_parse_params_json(tmp_path):
    cfg = ModelConfig.from_params_json(_write(tmp_path, PARAMS))
    assert cfg.num_heads == 32 and cfg.num_kv_heads == 4
    assert cfg.page_size == 128 and cfg.cache_mode == 1
    assert cfg.head_dim == 64
    cfg.validate()


def test_missing_mandatory_key(tmp_path):
    doc = dict(PARAMS)
    del doc["vocab_size"]
    with pytest.raises(ConfigError, match="vocab_size"):
        ModelConfig.from_params_json(_write(tmp_path, doc))


def test_num_kv_heads_defaults_to_num_heads(tmp_path):
    doc = dict(PARAMS)
    del doc["num_kv_heads"]
    cfg = ModelConfig.from_params_json(_write(tmp_path, doc))
    assert cfg.num_kv_heads == 32


def test_page_size_mandatory_only_for_paged(tmp_path):
    doc = dict(PARAMS)
    del doc["page_size"]
    with pytest.raises(ConfigError, match="page_size"):
        ModelConfig.from_params_json(_write(tmp_path, doc))
    doc["cache_mode"] = 0
    cfg = ModelConfig.from_params_json(_write(tmp_path, doc))
    assert cfg.cache_mode == 0


def test_validate_rejects_bad_quant():
    cfg = ModelConfig(**{k: PARAMS[k] for k in (
        "num_heads", "num_kv_heads", "num_layers", "hidden_dim",
        "intermediate_dim", "vocab_size")})
    cfg.cache_quant_bit, cfg.cache_quant_group = 8, 4
    with pytest.raises(ConfigError):
        cfg.validate()


def test_hf_config(tmp_path):
    hf = {
        "num_attention_heads": 32, "num_key_value_heads": 4,
        "num_hidden_layers": 22, "hidden_size": 2048,
        "intermediate_size": 5632, "vocab_size": 32000,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 2048, "model_type": "llama",
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(hf))
    cfg = ModelConfig.from_hf_config(str(p), cache_quant_bit=0,
                                     cache_quant_group=1)
    cfg.validate()
    assert cfg.intermediate_dim == 5632


def test_resource_config_tp_power_of_two():
    rc = ResourceConfig(tensor_parallel_size=3)
    with pytest.raises(ConfigError):
        rc.validate()
    ResourceConfig(tensor_parallel_size=8).validate()


def test_generator_config_validate():
    gc = GeneratorConfig(max_tokens_per_step=100,
                         max_input_tokens_per_request=4096)
    with pytest.raises(ConfigError):
        gc.validate()
