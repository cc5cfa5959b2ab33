"""gRPC serving tests: in-process server + real grpcio channel, tiny
random model — covers the full L6->L4->L3 stack (SURVEY.md section 3.2)."""

import threading
import time

import grpc
import pytest

from ppl.llm.serving_tpu.generator import LLMGenerator
from ppl.llm.serving_tpu.resources import create_engine
from ppl.llm.serving_tpu.serving.grpc_server import (AsyncGRPCServer,
                                                     GRPCConnection,
                                                     GRPCServer,
                                                     parse_pb_request)
from ppl.llm.serving_tpu.serving.proto import llm_pb2

from test_generator_e2e import DummyTokenizer, make_gen_cfg, make_model_cfg
from ppl.llm.serving_tpu.config import ResourceConfig

GENERATION = "/ppl.llm.proto.LLMService/Generation"


@pytest.fixture(scope="module", params=[GRPCServer, AsyncGRPCServer],
                ids=["threads", "aio"])
def server_port(request):
    model_cfg = make_model_cfg()
    gen_cfg = make_gen_cfg()
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=2048,
        token_buckets=(32, 64, 128, 256), batch_buckets=(4, 8, 16))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = GRPCConnection()
    generator = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(),
                             conn, kv_max)
    server = request.param(conn, generator.process, generator.clear_task)
    port = server.init("127.0.0.1", 0)
    server.start()
    yield port
    server.stop()
    generator.shutdown()


def make_stub(channel):
    return channel.unary_stream(
        GENERATION,
        request_serializer=llm_pb2.BatchedRequest.SerializeToString,
        response_deserializer=llm_pb2.BatchedResponse.FromString)


def make_request(cid, prompt="hello", gen_len=6, **stopping):
    batched = llm_pb2.BatchedRequest()
    req = batched.req.add()
    req.id = cid
    req.prompt = prompt
    req.stopping_parameters.max_new_tokens = gen_len
    for k, v in stopping.items():
        setattr(req.stopping_parameters, k, v)
    return batched


def test_generation_stream(server_port):
    with grpc.insecure_channel(f"127.0.0.1:{server_port}") as ch:
        stub = make_stub(ch)
        tokens, statuses = [], []
        for batched in stub(make_request(7, gen_len=6,
                                         ignore_eos_token=True)):
            for rsp in batched.rsp:
                assert rsp.id == 7  # client id echoed, not internal uid
                tokens.extend(rsp.tokens.ids)
                statuses.append(rsp.status)
        assert len(tokens) == 6
        assert statuses[-1] == llm_pb2.FINISHED
        assert all(s == llm_pb2.PROCESSING for s in statuses[:-1])


def test_multi_request_batch(server_port):
    with grpc.insecure_channel(f"127.0.0.1:{server_port}") as ch:
        stub = make_stub(ch)
        batched = llm_pb2.BatchedRequest()
        for cid in (100, 200):
            req = batched.req.add()
            req.id = cid
            req.prompt = f"prompt {cid}"
            req.stopping_parameters.max_new_tokens = 5
            req.stopping_parameters.ignore_eos_token = True
        counts = {100: 0, 200: 0}
        for b in stub(batched):
            for rsp in b.rsp:
                counts[rsp.id] += len(rsp.tokens.ids)
        assert counts == {100: 5, 200: 5}


def test_token_in_out(server_port):
    with grpc.insecure_channel(f"127.0.0.1:{server_port}") as ch:
        stub = make_stub(ch)
        batched = llm_pb2.BatchedRequest()
        req = batched.req.add()
        req.id = 1
        req.tokens.ids.extend([1, 5, 9])
        req.stopping_parameters.max_new_tokens = 4
        req.stopping_parameters.ignore_eos_token = True
        toks = []
        for b in stub(batched):
            for rsp in b.rsp:
                assert rsp.generated == ""
                toks.extend(rsp.tokens.ids)
        assert len(toks) == 4


def test_failure_status(server_port):
    with grpc.insecure_channel(f"127.0.0.1:{server_port}") as ch:
        stub = make_stub(ch)
        # 500-char prompt = 501 tokens > 128 max input -> FAILED
        statuses = [rsp.status
                    for b in stub(make_request(9, prompt="x" * 500))
                    for rsp in b.rsp]
        assert statuses == [llm_pb2.FAILED]


def test_disconnect_cancels(server_port):
    ch = grpc.insecure_channel(f"127.0.0.1:{server_port}")
    stub = make_stub(ch)
    it = stub(make_request(11, gen_len=64, ignore_eos_token=True))
    next(it)  # first streamed token arrives
    it.cancel()  # client walks away (grpc_server.cc:274-295)
    ch.close()
    time.sleep(0.5)  # generator should reclaim resources without hanging
    # server still serves new requests afterwards
    with grpc.insecure_channel(f"127.0.0.1:{server_port}") as ch2:
        stub2 = make_stub(ch2)
        got = sum(len(rsp.tokens.ids)
                  for b in stub2(make_request(12, gen_len=3,
                                              ignore_eos_token=True))
                  for rsp in b.rsp)
        assert got == 3


class TestParsePbRequest:
    def test_do_sample_gate(self):
        pb = llm_pb2.Request(prompt="x")
        pb.choosing_parameters.do_sample = False
        pb.choosing_parameters.top_k = 40
        pb.choosing_parameters.top_p = 0.9
        req = parse_pb_request(pb, 1)
        assert req.top_k == 1 and req.top_p == 0.0

    def test_defaulting(self):
        pb = llm_pb2.Request(prompt="x")
        req = parse_pb_request(pb, 1)
        assert req.temperature == 1.0
        assert req.repetition_penalty == 1.0
        assert req.early_stopping is True

    def test_top_p_clamp(self):
        pb = llm_pb2.Request(prompt="x")
        pb.choosing_parameters.do_sample = True
        pb.choosing_parameters.top_p = 1.5
        req = parse_pb_request(pb, 1)
        assert req.top_p == 0.0

    def test_token_in_out_stop_tokens(self):
        pb = llm_pb2.Request()
        pb.tokens.ids.extend([1, 2, 3])
        pb.stopping_parameters.stop_tokens.ids.extend([7, 8])
        req = parse_pb_request(pb, 1)
        assert req.token_ids == [1, 2, 3]
        assert req.stop_tokens == {7, 8}


@pytest.mark.parametrize("server_cls", [GRPCServer, AsyncGRPCServer],
                         ids=["threads", "aio"])
def test_concurrent_streams_beyond_small_worker_pools(server_cls):
    """Streams are admitted CONCURRENTLY, not serialized by the gRPC
    thread pool: each unary_stream handler parks a pool thread for its
    whole stream, so an undersized pool (the old max_workers=16 default)
    stalls request ingestion itself — the round-3 canonical benchmark
    measured 668 tok/s instead of thousands because only ~a dozen of 256
    streams were ever started. With n > 16 streams all admitted into one
    running batch, every stream's FIRST token must arrive before any
    stream's LAST token; the old default would finish the first 16
    before starting the rest."""
    n = 24
    model_cfg = make_model_cfg()
    # cadence off: this test pins FRONTEND ingestion concurrency via
    # token timing; the prefill-admission cadence legitimately delays a
    # straggler's first token by one decode block (= a whole generation
    # here, gen_len == block), which is scheduling policy, not the
    # thread-pool serialization this test exists to catch
    gen_cfg = make_gen_cfg(max_running_batch=32, max_prefill_batch=32,
                           max_tokens_per_step=2048,
                           prefill_admission_cadence=False)
    resource_cfg = ResourceConfig(
        model_format="random", kv_cache_max_tokens=4096,
        token_buckets=(32, 64, 128, 256), batch_buckets=(8, 32))
    engine, kv_max = create_engine(model_cfg, resource_cfg, gen_cfg)
    conn = GRPCConnection()
    generator = LLMGenerator(model_cfg, gen_cfg, engine, DummyTokenizer(),
                             conn, kv_max)
    server = server_cls(conn, generator.process, generator.clear_task)
    port = server.init("127.0.0.1", 0)
    server.start()
    first_ts, last_ts = {}, {}
    barrier = threading.Barrier(n)

    def run_stream(cid):
        with grpc.insecure_channel(f"127.0.0.1:{port}") as ch:
            stub = make_stub(ch)
            barrier.wait(timeout=60)
            for rsp in stub(make_request(cid, prompt=f"stream {cid}",
                                         gen_len=8)):
                now = time.monotonic()
                first_ts.setdefault(cid, now)
                last_ts[cid] = now

    threads = [threading.Thread(target=run_stream, args=(i,))
               for i in range(n)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert len(first_ts) == n and len(last_ts) == n
        # 0.2s tolerance: client-side timestamps of one step's flushed
        # sends can reorder by milliseconds under CPU load; the
        # serialized failure mode gaps by a whole stream's generation
        # time (seconds)
        assert max(first_ts.values()) < min(last_ts.values()) + 0.2, (
            "some stream finished before another even started: stream "
            "ingestion is serialized")
    finally:
        server.stop()
        generator.shutdown()
