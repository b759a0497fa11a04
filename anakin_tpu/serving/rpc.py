"""RPC inference service over gRPC generic handlers.

Parity with the reference's brpc service (`framework/service/
anakin_service.h:30-114`, schema `framework/service/api/service.proto:17-50`):

  RPCRequest  { model: str, request_id: int,
                inputs:  [{name, shape, dtype, data}] }
  RPCResponse { request_id, outputs: [{name, shape, dtype, data}],
                info: { duration_ms, device_status{...} } }

The reference shipped tensors as protobuf repeated floats; here frames are
msgpack (self-describing, zero codegen — grpc_tools isn't in this image,
and protoc 3.21 gencode clashes with the installed protobuf 6 runtime).
The method surface matches `AnakinService::evaluate` plus model listing.

Server holds {model_name -> ContinuousBatcher} the way the reference held
{model_name -> Worker} and attaches DeviceMonitor status to every response.
"""

from __future__ import annotations

import time
from concurrent import futures
from typing import Any, Dict, Optional

import numpy as np

import grpc
import msgpack

from .batcher import ContinuousBatcher
from .monitor import DeviceMonitor

__all__ = ["AnakinService", "serve", "RpcClient"]

_SERVICE = "anakin.AnakinService"


def _pack_array(name: str, a: np.ndarray) -> Dict[str, Any]:
    return {"name": name, "shape": list(a.shape), "dtype": str(a.dtype),
            "data": a.tobytes()}


def _unpack_array(d: Dict[str, Any]) -> np.ndarray:
    return np.frombuffer(d["data"], dtype=np.dtype(d["dtype"])).reshape(d["shape"])


class AnakinService:
    """model registry + evaluate dispatch (reference `AnakinService`)."""

    def __init__(self, monitor: Optional[DeviceMonitor] = None):
        self._models: Dict[str, ContinuousBatcher] = {}
        self._monitor = monitor or DeviceMonitor().start()

    def initial(self, model_name: str, batcher: ContinuousBatcher) -> None:
        """Register a model (reference `initial(model_name, path, threads)`)."""
        self._models[model_name] = batcher

    def initial_llm(self, model_name: str, scheduler) -> None:
        """Register a `runtime.DecodeScheduler` for the Generate RPC."""
        self._llms = getattr(self, "_llms", {})
        self._llms[model_name] = scheduler

    def _llm_submit(self, request: Dict[str, Any], on_token=None):
        model = request["model"]
        llms = getattr(self, "_llms", {})
        if model not in llms:
            raise KeyError(f"llm {model!r} not loaded")
        prompt = np.asarray(request["prompt"], np.int32)
        return llms[model].submit(
            prompt, int(request.get("max_new_tokens", 16)),
            temperature=float(request.get("temperature", 0.0)),
            top_k=int(request.get("top_k", 0)),
            top_p=float(request.get("top_p", 0.0)),
            stop_tokens=[int(t) for t in request.get("stop_tokens", ())],
            on_token=on_token)

    def generate(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Autoregressive generation over a registered DecodeScheduler:
        {model, request_id, prompt: [int], max_new_tokens[, temperature,
        top_k, top_p, stop_tokens]} -> {tokens}."""
        t0 = time.perf_counter()
        fut = self._llm_submit(request)
        tokens = fut.result(timeout=300)
        return {
            "request_id": request.get("request_id", 0),
            "tokens": [int(t) for t in tokens],
            "info": {
                "duration_ms": (time.perf_counter() - t0) * 1e3,
                "device_status": self._monitor.status().to_dict(),
            },
        }

    def generate_stream(self, request: Dict[str, Any]):
        """Streaming generation: yields {"token": id} frames as tokens
        decode (pushed from the scheduler thread through a queue), then a
        final {"done": True, "tokens": [...], "info": {...}} frame.  If
        the client goes away mid-stream (generator closed), the request
        is CANCELLED and its slot freed — the reference's Worker kept
        computing dropped futures; serving real traffic must not."""
        import queue as _q

        t0 = time.perf_counter()
        tokq: "_q.Queue" = _q.Queue()
        fut = self._llm_submit(request, on_token=tokq.put)
        try:
            while True:
                try:
                    yield {"token": int(tokq.get(timeout=0.05))}
                except _q.Empty:
                    if fut.done():
                        break
            while not tokq.empty():         # drain post-done stragglers
                yield {"token": int(tokq.get_nowait())}
            tokens = [] if fut.cancelled() else \
                [int(t) for t in fut.result(timeout=300)]
            yield {
                "done": True,
                "request_id": request.get("request_id", 0),
                "tokens": tokens,
                "info": {
                    "duration_ms": (time.perf_counter() - t0) * 1e3,
                    "device_status": self._monitor.status().to_dict(),
                },
            }
        finally:
            if not fut.done():
                fut.cancel()

    def evaluate(self, request: Dict[str, Any]) -> Dict[str, Any]:
        t0 = time.perf_counter()
        model = request["model"]
        if model not in self._models:
            raise KeyError(f"model {model!r} not loaded")
        feed = {d["name"]: _unpack_array(d) for d in request["inputs"]}
        out = self._models[model].submit(feed).result(timeout=120)
        return {
            "request_id": request.get("request_id", 0),
            "outputs": [_pack_array(k, np.asarray(v)) for k, v in out.items()],
            "info": {
                "duration_ms": (time.perf_counter() - t0) * 1e3,
                "device_status": self._monitor.status().to_dict(),
            },
        }

    def list_models(self) -> Dict[str, Any]:
        return {"models": sorted(self._models)}

    def shutdown(self) -> None:
        for b in self._models.values():
            b.shutdown()
        for s_ in getattr(self, "_llms", {}).values():
            s_.close()
        self._monitor.stop()


def _handler(service: AnakinService) -> grpc.GenericRpcHandler:
    def evaluate(request_bytes, context):
        req = msgpack.unpackb(request_bytes, raw=False)
        try:
            return msgpack.packb(service.evaluate(req), use_bin_type=True)
        except KeyError as e:
            context.abort(grpc.StatusCode.NOT_FOUND, str(e))

    def list_models(request_bytes, context):
        return msgpack.packb(service.list_models(), use_bin_type=True)

    def generate(request_bytes, context):
        req = msgpack.unpackb(request_bytes, raw=False)
        try:
            return msgpack.packb(service.generate(req), use_bin_type=True)
        except KeyError as e:
            context.abort(grpc.StatusCode.NOT_FOUND, str(e))

    def generate_stream(request_bytes, context):
        req = msgpack.unpackb(request_bytes, raw=False)
        try:
            for frame in service.generate_stream(req):
                yield msgpack.packb(frame, use_bin_type=True)
        except KeyError as e:
            context.abort(grpc.StatusCode.NOT_FOUND, str(e))

    methods = {
        "Evaluate": grpc.unary_unary_rpc_method_handler(evaluate),
        "Generate": grpc.unary_unary_rpc_method_handler(generate),
        "GenerateStream": grpc.unary_stream_rpc_method_handler(
            generate_stream),
        "ListModels": grpc.unary_unary_rpc_method_handler(list_models),
    }
    return grpc.method_handlers_generic_handler(_SERVICE, methods)


def serve(service: AnakinService, port: int = 0,
          max_workers: int = 8) -> grpc.Server:
    """Start a gRPC server; returns it (call .stop()). port=0 picks free."""
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((_handler(service),))
    bound = server.add_insecure_port(f"127.0.0.1:{port}")
    server.start()
    server._bound_port = bound  # convenience for tests
    return server


class RpcClient:
    def __init__(self, target: str):
        self._channel = grpc.insecure_channel(target)
        self._evaluate = self._channel.unary_unary(
            f"/{_SERVICE}/Evaluate",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        self._list = self._channel.unary_unary(
            f"/{_SERVICE}/ListModels",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        self._generate = self._channel.unary_unary(
            f"/{_SERVICE}/Generate",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        self._generate_stream = self._channel.unary_stream(
            f"/{_SERVICE}/GenerateStream",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )

    def evaluate(self, model: str, inputs: Dict[str, np.ndarray],
                 request_id: int = 0) -> Dict[str, Any]:
        req = {
            "model": model,
            "request_id": request_id,
            "inputs": [_pack_array(k, np.asarray(v)) for k, v in inputs.items()],
        }
        resp = msgpack.unpackb(self._evaluate(msgpack.packb(req, use_bin_type=True)),
                               raw=False)
        resp["outputs"] = {d["name"]: _unpack_array(d) for d in resp["outputs"]}
        return resp

    @staticmethod
    def _gen_req(model, prompt, max_new_tokens, request_id, **kw):
        req = {"model": model, "request_id": request_id,
               "prompt": [int(t) for t in np.asarray(prompt).reshape(-1)],
               "max_new_tokens": max_new_tokens}
        for k in ("temperature", "top_k", "top_p", "stop_tokens"):
            if kw.get(k) is not None:
                req[k] = kw[k]
        return req

    def generate(self, model: str, prompt, max_new_tokens: int = 16,
                 request_id: int = 0, **sampling) -> Dict[str, Any]:
        req = self._gen_req(model, prompt, max_new_tokens, request_id,
                            **sampling)
        return msgpack.unpackb(
            self._generate(msgpack.packb(req, use_bin_type=True)), raw=False)

    def generate_stream(self, model: str, prompt, max_new_tokens: int = 16,
                        request_id: int = 0, **sampling):
        """Yields {"token": id} frames, then the final {"done": True,
        "tokens": [...], "info": {...}} frame.  Closing the iterator
        early cancels the request server-side."""
        req = self._gen_req(model, prompt, max_new_tokens, request_id,
                            **sampling)
        stream = self._generate_stream(msgpack.packb(req, use_bin_type=True))
        try:
            for frame in stream:
                yield msgpack.unpackb(frame, raw=False)
        finally:
            stream.cancel()

    def list_models(self):
        return msgpack.unpackb(self._list(msgpack.packb({})), raw=False)["models"]

    def close(self):
        self._channel.close()
