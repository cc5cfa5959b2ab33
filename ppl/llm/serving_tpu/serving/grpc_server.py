"""Streaming gRPC frontend, wire-compatible with the reference server.

Equivalent of ``GRPCServer`` + ``GRPCConnection``
(``src/serving/grpc/grpc_server.cc``): the same
``LLMService.Generation(BatchedRequest) returns (stream BatchedResponse)``
contract (``llm.proto:5-7``), client-id -> internal-uid remapping
(``grpc_server.cc:227-240``), per-token streaming with finish reasons, and
disconnect-triggered task cancellation (``grpc_server.cc:274-295``).

The reference's hand-rolled async completion-queue event loop
(``grpc_server.h:113-121``) is replaced by grpcio's threaded server — the
TPU engine is driven by the single generate thread either way, so frontend
concurrency only needs to keep the MPSC scheduler fed.

No grpc_tools codegen is available in this environment, so the service is
registered through a generic handler with the protoc-generated message
classes — same bytes on the wire.
"""

from __future__ import annotations

import asyncio
import logging
import queue
import threading
from concurrent import futures
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import grpc

from ..connection import Connection
from ..request import FinishFlag, Request, Response
from .proto import llm_pb2

logger = logging.getLogger("ppl.llm.serving_tpu.grpc")

_SERVICE_NAME = "ppl.llm.proto.LLMService"

_FINISH_REASON = {
    FinishFlag.LENGTH: llm_pb2.FINISH_REASON_LENGTH,
    FinishFlag.EOS_TOKEN: llm_pb2.FINISH_REASON_EOS_TOKEN,
    FinishFlag.STOP_SEQUENCE: llm_pb2.FINISH_REASON_STOP_SEQUENCE,
}


def parse_pb_request(pb_req: llm_pb2.Request, uid: int) -> Request:
    """proto -> Request with the reference's defaulting rules
    (``grpc_server.cc:157-189``): do_sample gate, top_p clamp, zero
    temperature/repetition-penalty -> 1.0, early_stopping =
    !ignore_eos_token."""
    req = Request(id=uid)
    if pb_req.prompt:
        req.prompt = pb_req.prompt
    else:
        req.token_ids = list(pb_req.tokens.ids)
        stop_ids = list(pb_req.stopping_parameters.stop_tokens.ids)
        req.stop_tokens = set(stop_ids) if stop_ids else set()
    cp = pb_req.choosing_parameters
    if cp.do_sample:
        req.top_k = cp.top_k
        req.top_p = cp.top_p
    else:
        req.top_k = 1
        req.top_p = 0.0
    if not (0.0 <= req.top_p <= 1.0):
        req.top_p = 0.0
    req.temperature = cp.temperature or 1.0
    req.repetition_penalty = cp.repetition_penalty or 1.0
    req.presence_penalty = cp.presence_penalty
    req.frequency_penalty = cp.frequency_penalty
    req.generation_length = pb_req.stopping_parameters.max_new_tokens
    req.early_stopping = not pb_req.stopping_parameters.ignore_eos_token
    return req


class _CallState:
    """One client Generation call: its outgoing queue and live tids.

    With ``loop`` (grpc.aio frontend) the queue is an asyncio.Queue and
    producers — the generate thread, via ``GRPCConnection.send`` — post
    through ``call_soon_threadsafe``; without it (threaded frontend) a
    thread-safe SimpleQueue is consumed by a blocking pool thread."""

    __slots__ = ("out_queue", "tid_to_client_id", "pending", "_loop")

    def __init__(self, loop: Optional[asyncio.AbstractEventLoop] = None):
        self._loop = loop
        self.out_queue = asyncio.Queue() if loop else queue.SimpleQueue()
        self.tid_to_client_id: Dict[int, int] = {}
        self.pending = 0

    def put(self, item) -> None:
        if self._loop is not None:
            self._loop.call_soon_threadsafe(self.out_queue.put_nowait, item)
        else:
            self.out_queue.put(item)


class GRPCConnection(Connection):
    """Routes generator upcalls back to the right client stream."""

    def __init__(self):
        self._lock = threading.Lock()
        self._tid_to_call: Dict[int, _CallState] = {}

    def register(self, call: _CallState, tid: int, client_id: int) -> None:
        with self._lock:
            call.tid_to_client_id[tid] = client_id
            call.pending += 1
            self._tid_to_call[tid] = call

    def on_profiling(self, profiler) -> None:
        # [PERF] block to stderr, reference server behavior
        # (llm_generator.cc:768-780 -> PrintProfiler)
        from ..profiler import print_profiler
        print_profiler(profiler)

    def _finish_tid(self, call: _CallState, tid: int) -> bool:
        """Returns True when the call has no tids left; the caller must
        enqueue the end-of-stream sentinel AFTER the final response batch."""
        del self._tid_to_call[tid]
        call.pending -= 1
        return call.pending <= 0

    def drop_call(self, call: _CallState) -> List[int]:
        """Client disconnected: unregister and return tids to cancel."""
        with self._lock:
            tids = [tid for tid, c in self._tid_to_call.items() if c is call]
            for tid in tids:
                del self._tid_to_call[tid]
            call.pending = 0
            return tids

    def send(self, responses: Sequence[Response]) -> None:
        """``GRPCConnection::Send`` (``grpc_server.cc:88-134``): group the
        step's responses per client call into BatchedResponse messages."""
        grouped: Dict[int, Tuple[_CallState, llm_pb2.BatchedResponse]] = {}
        done_calls: List[_CallState] = []
        with self._lock:
            for rsp in responses:
                call = self._tid_to_call.get(rsp.id)
                if call is None:
                    continue  # canceled mid-flight
                ent = grouped.get(id(call))
                if ent is None:
                    ent = (call, llm_pb2.BatchedResponse())
                    grouped[id(call)] = ent
                pb = ent[1].rsp.add()
                pb.id = call.tid_to_client_id[rsp.id]
                pb.generated = rsp.generated
                if rsp.token >= 0:
                    pb.tokens.ids.append(rsp.token)
                pb.detail.logprobs = rsp.logprob
                pb.detail.is_special = rsp.is_special
                if rsp.finish_flag == FinishFlag.NOT_FINISHED:
                    pb.status = llm_pb2.PROCESSING
                else:
                    pb.status = llm_pb2.FINISHED
                    pb.detail.finish_reason = _FINISH_REASON[rsp.finish_flag]
                    if self._finish_tid(call, rsp.id):
                        done_calls.append(call)
        for call, batched in grouped.values():
            call.put(batched)
        for call in done_calls:
            call.put(None)  # end-of-stream sentinel

    def notify_failure(self, tid: int, rc: int = 1, msg: str = "") -> None:
        with self._lock:
            call = self._tid_to_call.get(tid)
            if call is None:
                return
            batched = llm_pb2.BatchedResponse()
            pb = batched.rsp.add()
            pb.id = call.tid_to_client_id[tid]
            pb.status = llm_pb2.FAILED
            pb.generated = msg
            done = self._finish_tid(call, tid)
        call.put(batched)
        if done:
            call.put(None)


class GRPCServer:
    """``GRPCServer::{Init, Loop}`` equivalent on grpcio."""

    def __init__(self, conn: GRPCConnection,
                 process_func: Callable[[Request], None],
                 on_disconnected_func: Callable[[int], None],
                 max_workers: int = 1024):
        # Each unary_stream handler OCCUPIES a pool thread for its whole
        # stream lifetime (the response generator blocks in the pool), so
        # max_workers bounds CONCURRENT STREAMS, not transient work.
        # 16 workers serialized the round-3 canonical benchmark to ~4
        # admitted requests at a time (668 tok/s instead of thousands;
        # BASELINE.md). The reference's async-CQ loop has no such bound
        # (grpc_server.h:113-121); 1024 parked threads (~blocked on
        # queue.get) are the grpcio-threaded equivalent.
        self._conn = conn
        self._process = process_func
        self._on_disconnected = on_disconnected_func
        self._uid_seq = 0
        self._uid_lock = threading.Lock()
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers),
            options=[("grpc.max_send_message_length", 64 * 1024 * 1024),
                     ("grpc.max_receive_message_length", 64 * 1024 * 1024)])
        handler = grpc.method_handlers_generic_handler(
            _SERVICE_NAME,
            {"Generation": grpc.unary_stream_rpc_method_handler(
                self._generation,
                request_deserializer=llm_pb2.BatchedRequest.FromString,
                response_serializer=llm_pb2.BatchedResponse.SerializeToString,
            )})
        self._server.add_generic_rpc_handlers((handler,))

    def _next_uid(self) -> int:
        with self._uid_lock:
            self._uid_seq += 1
            return self._uid_seq

    def _generation(self, batched_req: llm_pb2.BatchedRequest, context):
        call = _CallState()

        def on_cancel():
            for tid in self._conn.drop_call(call):
                logger.info("client disconnected, canceling task %d", tid)
                self._on_disconnected(tid)
            call.out_queue.put(None)

        context.add_callback(on_cancel)

        if not batched_req.req:
            return  # empty batch: close the stream, don't wait forever

        for pb_req in batched_req.req:
            uid = self._next_uid()
            self._conn.register(call, uid, pb_req.id)
            req = parse_pb_request(pb_req, uid)
            self._process(req)

        while True:
            item = call.out_queue.get()
            if item is None:
                return
            yield item

    def init(self, host: str, port: int) -> int:
        bound = self._server.add_insecure_port(f"{host}:{port}")
        if bound == 0:
            raise RuntimeError(f"failed to bind {host}:{port}")
        return bound

    def loop(self) -> None:
        self._server.start()
        logger.info("gRPC server listening")
        self._server.wait_for_termination()

    def start(self) -> None:
        self._server.start()

    def stop(self, grace: float = 1.0) -> None:
        self._server.stop(grace)


class AsyncGRPCServer:
    """grpc.aio frontend: one coroutine per live stream.

    The threaded ``GRPCServer`` parks a pool thread per concurrent
    stream for its whole lifetime — correct, but a 1024-stream
    canonical run allocates 1024 blocked threads. This is the idiomatic
    equivalent of the reference's async completion-queue event loop
    (``grpc_server.h:113-121``): stream concurrency costs one
    asyncio task + one Queue each, no thread.

    The event loop runs in a dedicated daemon thread so the (sync)
    server tool and tests keep the same init()/start()/loop()/stop()
    interface; grpc.aio objects are created INSIDE that loop (aio
    channels/servers bind to the loop current at construction time).
    The generate thread posts responses via
    ``loop.call_soon_threadsafe`` (see ``_CallState.put``).
    """

    def __init__(self, conn: GRPCConnection,
                 process_func: Callable[[Request], None],
                 on_disconnected_func: Callable[[int], None],
                 max_workers: int = 0):  # accepted for interface parity
        self._conn = conn
        self._process = process_func
        self._on_disconnected = on_disconnected_func
        self._uid_seq = 0
        self._uid_lock = threading.Lock()
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._loop_thread: Optional[threading.Thread] = None
        self._server = None

    def _next_uid(self) -> int:
        with self._uid_lock:
            self._uid_seq += 1
            return self._uid_seq

    async def _generation(self, batched_req: llm_pb2.BatchedRequest,
                          context):
        call = _CallState(loop=asyncio.get_running_loop())
        if not batched_req.req:
            return  # empty batch: close the stream, don't wait forever
        try:
            for pb_req in batched_req.req:
                uid = self._next_uid()
                self._conn.register(call, uid, pb_req.id)
                self._process(parse_pb_request(pb_req, uid))
            while True:
                item = await call.out_queue.get()
                if item is None:
                    return
                yield item
        finally:
            # normal end: drop_call returns [] (all tids finished).
            # cancellation/disconnect: CancelledError lands on the
            # await above and the still-live tids are canceled here
            # (grpc_server.cc:274-295 semantics).
            for tid in self._conn.drop_call(call):
                logger.info("client disconnected, canceling task %d", tid)
                self._on_disconnected(tid)

    async def _create_and_bind(self, host: str, port: int) -> int:
        self._server = grpc.aio.server(
            options=[("grpc.max_send_message_length", 64 * 1024 * 1024),
                     ("grpc.max_receive_message_length", 64 * 1024 * 1024)])
        handler = grpc.method_handlers_generic_handler(
            _SERVICE_NAME,
            {"Generation": grpc.unary_stream_rpc_method_handler(
                self._generation,
                request_deserializer=llm_pb2.BatchedRequest.FromString,
                response_serializer=llm_pb2.BatchedResponse.SerializeToString,
            )})
        self._server.add_generic_rpc_handlers((handler,))
        return self._server.add_insecure_port(f"{host}:{port}")

    def init(self, host: str, port: int) -> int:
        self._loop = asyncio.new_event_loop()
        self._loop_thread = threading.Thread(
            target=self._loop.run_forever, name="grpc-aio-loop", daemon=True)
        self._loop_thread.start()
        bound = asyncio.run_coroutine_threadsafe(
            self._create_and_bind(host, port), self._loop).result()
        if bound == 0:
            raise RuntimeError(f"failed to bind {host}:{port}")
        return bound

    def start(self) -> None:
        asyncio.run_coroutine_threadsafe(
            self._server.start(), self._loop).result()

    def loop(self) -> None:
        self.start()
        logger.info("gRPC server listening")
        asyncio.run_coroutine_threadsafe(
            self._server.wait_for_termination(), self._loop).result()

    def stop(self, grace: float = 1.0) -> None:
        asyncio.run_coroutine_threadsafe(
            self._server.stop(grace), self._loop).result()
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._loop_thread.join(timeout=10)
