"""Benchmark tooling smoke tests: the canonical qps_measure pipeline
(gen_samples workload -> gRPC server -> client_qps_measure metrics) runs
end-to-end on CPU with a tiny model, mirroring the reference's
samples_1024.json + client_qps_measure.cc methodology."""

import json
import os
import subprocess
import sys

import pytest

from ppl.llm.serving_tpu.config import ResourceConfig
from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.resources import create_engine
from ppl.llm.serving_tpu.serving.grpc_server import GRPCConnection, GRPCServer

from test_generator_e2e import DummyTokenizer, make_gen_cfg, make_model_cfg

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


@pytest.fixture(scope="module")
def qps_server_port():
    model_cfg = make_model_cfg()
    gen_cfg = make_gen_cfg()
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = GRPCConnection()
    generator = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(),
                             conn, kv_max)
    server = GRPCServer(conn, generator.process, generator.clear_task)
    port = server.init("127.0.0.1", 0)
    server.start()
    yield port
    server.stop()
    generator.shutdown()


def test_gen_samples_format(tmp_path):
    out = tmp_path / "samples.json"
    subprocess.run(
        [sys.executable, os.path.join(TOOLS, "gen_samples.py"),
         "--output", str(out), "--count", "8",
         "--prompt-mean", "4", "--answer-mean", "3"],
        check=True, timeout=60)
    samples = json.loads(out.read_text())
    assert len(samples) == 8
    conv = samples[0]["conversations"]
    froms = [c["from"] for c in conv]
    assert "human" in froms and "gpt" in froms


def test_client_qps_measure_end_to_end(tmp_path, qps_server_port):
    """The full benchmark client against a live server: must stream every
    request to completion and print the reference metric block."""
    out = tmp_path / "samples.json"
    subprocess.run(
        [sys.executable, os.path.join(TOOLS, "gen_samples.py"),
         "--output", str(out), "--count", "4",
         "--prompt-mean", "3", "--answer-mean", "2"],
        check=True, timeout=60)
    env = dict(os.environ, PPL_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "client_qps_measure.py"),
         "--target", f"127.0.0.1:{qps_server_port}",
         "--dataset", str(out), "--num-requests", "4",
         "--request-rate", "inf"],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    text = proc.stdout
    for needle in ("benchmark time", "tokens out per sec", "qps",
                   "prefill latency"):
        assert needle.lower() in text.lower(), text
