"""Online inference service: JSON-over-HTTP in front of the dynamic batcher.

The reference cannot serve at all — prediction requires a labeled dataset CSV
and an offline eval run (``/root/reference/eval_mtl_concat.py:72-138``). This
module is the deployment surface: load a checkpoint once, keep the jitted
model resident on the TPU, and answer concurrent prediction requests, which
the :class:`~toad_tpu.serve.batcher.DynamicBatcher` coalesces into padded
batched forwards.

Stdlib only (``http.server`` + ``ThreadingHTTPServer``): each request thread
blocks on its Future while the single dispatch thread feeds the device, so
concurrency in the HTTP layer translates directly into device batch size.

API:

- ``GET  /healthz``  → ``{"status": "ok", "device": ...}``
- ``GET  /stats``    → request/batch counters incl. mean batch size
- ``POST /heatmap``  → ``{"bag_path": ..., "sex": ..., "patch_size"?, "downscale"?}``
  → attention heatmap as ``image/png`` bytes (bag must carry coords)
- ``POST /predict``  → body is JSON with either
    - ``features_b64``: base64 little-endian float32 ``[n*dim]`` + ``shape``, or
    - ``features_int8_b64`` + ``scales_b64`` + ``shape``: client-side
      pre-quantized rows (int8 mode only — 4x fewer wire bytes; produce with
      ``ops/quantize.py::quantize_rows_np``), or
    - ``features``: nested lists ``[n][dim]`` (convenience, slow), or
    - ``bag_path``: server-side path to a ``.pt``/``.h5``/``.npy`` feature bag;
  plus ``sex`` ("F"/"M"/0/1), optional ``top_k`` (default 5) and
  ``attention`` (bool; include raw per-patch attention scores).
- ``POST /predict`` with ``Content-Type: application/octet-stream`` → the
  raw-binary fast path: the body IS the feature bytes (no JSON parse, no
  base64 — a 32 MB f32 bag costs 32 MB on the wire and one ``frombuffer``
  on the 1-core serving host instead of a ~43 MB base64 decode + JSON
  parse). Request metadata rides in headers:
    - ``X-Toad-Shape: <n_patches>,<dim>`` (required)
    - ``X-Toad-Dtype: float32`` (default) | ``bfloat16`` | ``int8`` —
      ``bfloat16`` halves the f32 wire (numerically invisible under bf16
      compute); for ``int8`` the body is ``n*dim`` int8 row bytes followed
      by ``n`` little-endian f32 per-row scales (int8 serving mode only)
    - ``X-Toad-Sex: F|M|0|1`` (required)
    - ``X-Toad-Top-K: 5`` / ``X-Toad-Attention: 0|1`` (optional)
  The response is the same JSON document as the JSON routes. All POST
  bodies (JSON and raw) are capped at ``max_body_bytes`` (default 1 GiB,
  413 beyond it).
"""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import numpy as np

from toad_tpu.config import ModelConfig, TaskConfig
from toad_tpu.pipeline.infer import SlidePrediction
from toad_tpu.serve.batcher import DynamicBatcher, ServeConfig


class InferenceService:
    """Checkpoint + task vocabulary + dynamic batcher, as one object."""

    def __init__(
        self,
        params: Any,
        model_cfg: ModelConfig,
        serve_cfg: ServeConfig = ServeConfig(),
        task: TaskConfig | None = None,
        mesh=None,
        bag_root: Any = None,
    ):
        from pathlib import Path

        self.model_cfg = model_cfg
        self.batcher = DynamicBatcher(params, model_cfg, serve_cfg, mesh=mesh)
        # bag_path requests may only read under this directory; None = no
        # restriction (in-process embedders; HTTP additionally requires a
        # root when bound beyond loopback — see make_http_server)
        self.bag_root: Path | None = Path(bag_root).resolve() if bag_root is not None else None
        self.task = task
        self.inv_labels: dict[int, str] | None = None
        self.inv_site: dict[int, str] | None = None
        if task is not None:
            from toad_tpu.utils import invert_labels

            self.inv_labels = invert_labels(task.label_dicts[0])
            if len(task.label_dicts) > 1:
                self.inv_site = invert_labels(task.label_dicts[1])

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_path,
        model_cfg: ModelConfig,
        serve_cfg: ServeConfig = ServeConfig(),
        task: TaskConfig | None = None,
        mesh=None,
        bag_root: Any = None,
        ensemble: bool = False,
    ) -> "InferenceService":
        """Orbax checkpoint directory or reference torch ``s_k_checkpoint.pt``
        (one shared loading policy: :func:`toad_tpu.train.checkpoint.load_params_any`).

        ``ensemble=True``: ``ckpt_path`` is a training results dir
        (``cli/train.py`` layout) and every ``s_<k>_checkpoint`` member is
        served as a mean-of-folds ensemble — the batcher stacks the member
        params and runs every member inside one jitted forward, so each
        request batch still costs one dispatch (see
        :class:`~toad_tpu.serve.batcher.DynamicBatcher`)."""
        from toad_tpu.train.checkpoint import load_params_any

        if ensemble:
            from toad_tpu.pipeline.infer import find_fold_checkpoints

            found = find_fold_checkpoints(ckpt_path)
            if not found:
                raise FileNotFoundError(
                    f"--ensemble: no s_<k>_checkpoint members under {ckpt_path}"
                )
            params = [load_params_any(p, model_cfg) for _, p in found]
        else:
            params = load_params_any(ckpt_path, model_cfg)
        return cls(
            params, model_cfg, serve_cfg,
            task=task, mesh=mesh, bag_root=bag_root,
        )

    # -- prediction --------------------------------------------------------------

    def _resolve_bag_path(self, bag_path):
        """Resolve a client-supplied bag path against ``bag_root`` and refuse
        escapes (``..``, absolute paths, symlinks out of the root) — an
        unrestricted server-side path would let any network client read and
        probe arbitrary host files."""
        from pathlib import Path

        p = Path(bag_path)
        if self.bag_root is None:
            return p
        resolved = (p if p.is_absolute() else self.bag_root / p).resolve()
        if not resolved.is_relative_to(self.bag_root):
            raise PermissionError("bag_path resolves outside the served bag root")
        return resolved

    def predict_features(
        self, features: np.ndarray, sex: int, top_k: int = 5, attention: bool = False
    ) -> dict:
        pred = self.batcher.predict(features, sex, attention=attention)
        return self._to_json(pred, top_k, attention)

    def predict_quantized_features(
        self, xq: np.ndarray, scales: np.ndarray, sex: int, top_k: int = 5, attention: bool = False
    ) -> dict:
        """Client-side pre-quantized rows (int8 + per-row scales): 4x fewer
        network bytes than f32 and no handler-thread quantization pass —
        the wire analog of the int8 bag-store passthrough. int8 mode only."""
        pred = self.batcher.submit_quantized(xq, scales, sex, attention=attention).result()
        return self._to_json(pred, top_k, attention)

    def predict_bag(self, bag_path, sex: int, top_k: int = 5, attention: bool = False) -> dict:
        from toad_tpu.data.bags import load_bag, load_bag_quantized

        bag_path = self._resolve_bag_path(bag_path)
        if not bag_path.exists():
            raise FileNotFoundError(f"feature bag not found: {bag_path}")
        if self.batcher.cfg.int8:
            # int8-stored bags skip the handler-thread quantization pass
            # (exact: the stored rows ARE the quantized rows)
            q = load_bag_quantized(bag_path)
            if q is not None:
                xq, sx, _ = q
                pred = self.batcher.submit_quantized(xq, sx, sex, attention=attention).result()
                return self._to_json(pred, top_k, attention)
        feats, _ = load_bag(bag_path, with_coords=True)
        return self.predict_features(np.asarray(feats, np.float32), sex, top_k, attention)

    def heatmap_png(
        self, bag_path, sex: int, patch_size: int = 256, downscale: int = 32, task: str = "origin"
    ) -> bytes:
        """Attention heatmap PNG for a coords-bearing bag (.h5, or .npy/.pt
        with a coords sidecar) — the serving analog of ``cli/infer --heatmap``.
        ``task`` picks the attention head: 'origin' or 'site' (the CLI's
        ``--attention_task``)."""
        from toad_tpu.data.bags import load_bag
        from toad_tpu.pipeline.heatmap import encode_png, render_heatmap

        if task not in ("origin", "site"):
            raise ValueError(f"task must be 'origin' or 'site', got {task!r}")
        if patch_size < 1 or downscale < 1:
            raise ValueError(f"patch_size/downscale must be >= 1, got {patch_size}/{downscale}")
        bag_path = self._resolve_bag_path(bag_path)
        if not bag_path.exists():
            raise FileNotFoundError(f"feature bag not found: {bag_path}")
        feats, coords = load_bag(bag_path, with_coords=True)
        if coords is None:
            raise ValueError(f"{bag_path} carries no patch coordinates — cannot render a heatmap")
        pred = self.batcher.predict(np.asarray(feats, np.float32), sex, attention=True)
        scores = pred.attention if task == "origin" else pred.site_attention
        coords = np.asarray(coords)[: len(scores)]  # oversize bags head-truncate
        img = render_heatmap(coords, scores, patch_size=patch_size, downscale=downscale)
        return encode_png(img)

    def _to_json(self, pred: SlidePrediction, top_k: int, attention: bool) -> dict:
        def label(i: int) -> str:
            return self.inv_labels.get(i, str(i)) if self.inv_labels else str(i)

        def site_label(i: int) -> str:
            return self.inv_site.get(i, str(i)) if self.inv_site else str(i)

        out = {
            "y_hat": pred.y_hat,
            "label": label(pred.y_hat),
            "y_prob": [float(p) for p in pred.y_prob],
            "topk": [[label(i), p] for i, p in pred.topk[:top_k]],
            "site_hat": pred.site_hat,
            "site_label": site_label(pred.site_hat),
            "site_prob": [float(p) for p in pred.site_prob],
        }
        if attention:
            out["attention"] = [float(a) for a in pred.attention]
        return out

    def stats(self) -> dict:
        s = self.batcher.stats()
        cfg = self.batcher.cfg
        return {
            "requests": s.requests,
            "batches": s.batches,
            "served": s.batched_slides,
            "padded_slots": s.padded_slots,
            "mean_batch_size": round(s.mean_batch_size, 3),
            # deployed config echo: lets operators verify what's actually
            # serving (ladder/int8/temperature) without reading launch flags
            "config": {
                "buckets": list(self.batcher.buckets),
                "max_batch": cfg.max_batch,
                "max_wait_ms": cfg.max_wait_ms,
                "int8": cfg.int8,
                "temperature": cfg.temperature,
                "transfer_dtype": cfg.transfer_dtype,
                "ensemble_members": self.batcher.n_members,
            },
        }

    def close(self, timeout: float = 60.0) -> bool:
        """Returns True when the dispatch thread fully drained (see
        :meth:`DynamicBatcher.close`)."""
        return self.batcher.close(timeout)


def _decode_features(body: dict, in_dim: int) -> np.ndarray:
    if "features_b64" in body:
        shape = body.get("shape")
        if not (
            isinstance(shape, list)
            and len(shape) == 2
            and all(isinstance(v, int) and not isinstance(v, bool) and v > 0 for v in shape)
        ):
            raise ValueError("features_b64 requires 'shape': [n_patches, dim] (positive integers)")
        if shape[1] != in_dim:
            raise ValueError(f"feature dim {shape[1]} != model in_dim {in_dim}")
        raw = base64.b64decode(body["features_b64"])
        arr = np.frombuffer(raw, dtype="<f4")
        if arr.size != shape[0] * shape[1]:
            raise ValueError(f"payload has {arr.size} floats, shape says {shape[0] * shape[1]}")
        return arr.reshape(shape[0], shape[1])
    if "features" in body:
        arr = np.asarray(body["features"], np.float32)
        if arr.ndim != 2 or arr.shape[1] != in_dim:
            raise ValueError(f"features must be [n_patches, {in_dim}], got shape {arr.shape}")
        return arr
    raise ValueError("body needs one of: features_b64, features_int8_b64, features, bag_path")


def _decode_features_int8(body: dict, in_dim: int) -> tuple[np.ndarray, np.ndarray]:
    """``features_int8_b64`` (int8 rows) + ``scales_b64`` (f32 per-row) +
    ``shape`` -> (xq [n, dim] int8, scales [n] f32). Produce the payload with
    ``toad_tpu.ops.quantize.quantize_rows_np`` (or read an int8 bag store)."""
    shape = body.get("shape")
    if not (
        isinstance(shape, list)
        and len(shape) == 2
        and all(isinstance(v, int) and not isinstance(v, bool) and v > 0 for v in shape)
    ):
        raise ValueError("features_int8_b64 requires 'shape': [n_patches, dim] (positive integers)")
    if shape[1] != in_dim:
        raise ValueError(f"feature dim {shape[1]} != model in_dim {in_dim}")
    if "scales_b64" not in body:
        raise ValueError("features_int8_b64 requires 'scales_b64' (base64 f32 [n_patches])")
    xq = np.frombuffer(base64.b64decode(body["features_int8_b64"]), dtype=np.int8)
    if xq.size != shape[0] * shape[1]:
        raise ValueError(f"payload has {xq.size} int8 values, shape says {shape[0] * shape[1]}")
    scales = np.frombuffer(base64.b64decode(body["scales_b64"]), dtype="<f4")
    if scales.size != shape[0]:
        raise ValueError(f"scales_b64 has {scales.size} floats, shape says {shape[0]} rows")
    return xq.reshape(shape[0], shape[1]), scales


def _decode_raw_request(headers, body: bytes, in_dim: int):
    """Raw ``application/octet-stream`` body -> (features, scales|None).

    f32: body is ``n*dim`` little-endian float32 bytes. int8: body is
    ``n*dim`` int8 row bytes + ``n`` little-endian f32 per-row scales.
    Shape/dtype ride in ``X-Toad-Shape`` / ``X-Toad-Dtype`` headers so the
    handler thread does zero parsing beyond two ``np.frombuffer`` views."""
    shape_hdr = headers.get("X-Toad-Shape")
    if not shape_hdr:
        raise ValueError("octet-stream predict requires 'X-Toad-Shape: <n_patches>,<dim>'")
    try:
        n, dim = (int(v) for v in shape_hdr.split(","))
    except Exception:
        raise ValueError(f"malformed X-Toad-Shape {shape_hdr!r} (want '<n_patches>,<dim>')")
    if n <= 0 or dim <= 0:
        raise ValueError(f"X-Toad-Shape dims must be positive, got {n},{dim}")
    if dim != in_dim:
        raise ValueError(f"feature dim {dim} != model in_dim {in_dim}")
    dtype = (headers.get("X-Toad-Dtype") or "float32").strip().lower()
    if dtype in ("float32", "f32"):
        if len(body) != n * dim * 4:
            raise ValueError(f"body has {len(body)} bytes, shape {n},{dim} f32 needs {n * dim * 4}")
        return np.frombuffer(body, dtype="<f4").reshape(n, dim), None
    if dtype in ("bfloat16", "bf16"):
        # half the client->server bytes of f32; under bf16 compute the server
        # would cast the rows to bf16 before H2D anyway, so the client-side
        # cast is numerically invisible end-to-end
        import ml_dtypes

        if len(body) != n * dim * 2:
            raise ValueError(f"body has {len(body)} bytes, shape {n},{dim} bf16 needs {n * dim * 2}")
        return np.frombuffer(body, dtype=ml_dtypes.bfloat16).reshape(n, dim), None
    if dtype == "int8":
        if len(body) != n * dim + n * 4:
            raise ValueError(
                f"body has {len(body)} bytes, shape {n},{dim} int8+scales needs {n * dim + n * 4}"
            )
        xq = np.frombuffer(body, dtype=np.int8, count=n * dim).reshape(n, dim)
        scales = np.frombuffer(body, dtype="<f4", offset=n * dim)
        return xq, scales
    raise ValueError(f"unsupported X-Toad-Dtype {dtype!r} (float32, bfloat16, or int8)")


class DrainableHTTPServer(ThreadingHTTPServer):
    """``ThreadingHTTPServer`` that can wait for in-request handler threads.

    Handler threads are daemons, so after the batcher drain completes the
    interpreter could exit while a handler is still waking from its Future
    and writing the response body — the client would see a reset instead of
    the drained result. Handlers report request begin/end here and shutdown
    calls :meth:`drain_requests` to close that window (bounded, so a stalled
    client socket can't wedge shutdown past its own 120s timeout)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._inflight = 0
        self._inflight_cv = threading.Condition()

    def request_began(self) -> None:
        with self._inflight_cv:
            self._inflight += 1

    def request_done(self) -> None:
        with self._inflight_cv:
            self._inflight -= 1
            self._inflight_cv.notify_all()

    def drain_requests(self, timeout: float = 10.0) -> bool:
        """Wait until no handler is mid-request; True if fully drained."""
        import time

        deadline = time.monotonic() + timeout
        with self._inflight_cv:
            while self._inflight > 0:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    return False
                self._inflight_cv.wait(remaining)
        return True


def make_http_server(
    service: InferenceService,
    host: str = "127.0.0.1",
    port: int = 8000,
    max_body_bytes: int = 1 << 30,
):
    """Build (not start) a ``ThreadingHTTPServer``; ``port=0`` picks a free
    port (``server.server_address[1]``). Caller owns serve_forever/shutdown.

    Server-side ``bag_path`` requests are only honored when the service has a
    ``bag_root`` OR the server is bound to loopback: a network-exposed server
    with unrestricted paths would be an arbitrary-file read oracle.

    ``max_body_bytes`` caps every POST body (JSON and raw binary) — default
    1 GiB, enough for a 163,840x1024 f32 patient bag (640 MiB) while bounding
    what a single request can make the host buffer."""
    bag_paths_ok = service.bag_root is not None or host in ("127.0.0.1", "localhost", "::1")

    class Handler(BaseHTTPRequestHandler):
        # socket timeout: a client that stalls mid-body (or lies about
        # Content-Length) gets its connection dropped instead of pinning a
        # handler thread forever
        timeout = 120

        def log_message(self, *a):  # quiet by default; /stats has the counters
            pass

        def _send(self, code: int, obj: dict) -> None:
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _send_bytes(self, payload: bytes, ctype: str = "image/png") -> None:
            """Binary 200. Swallows mid-write disconnects so the outer error
            mapping never attempts a second response on a dead socket."""
            try:
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            except (BrokenPipeError, ConnectionResetError):
                pass

        def do_GET(self):
            self.server.request_began()
            try:
                self._handle_get()
            finally:
                self.server.request_done()

        def do_POST(self):
            self.server.request_began()
            try:
                self._handle_post()
            finally:
                self.server.request_done()

        def _handle_get(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {"status": "ok", "device": str(jax.devices()[0])})
            elif self.path == "/stats":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def _handle_post(self):
            if self.path not in ("/predict", "/heatmap"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0) or 0)
            except ValueError:
                self.close_connection = True  # body length unknown: can't skip it
                self._send(400, {"error": "malformed Content-Length"})
                return
            if length > max_body_bytes:
                # don't read the oversize body; close so the unread bytes
                # can't be misparsed as a pipelined next request
                self.close_connection = True
                self._send(413, {"error": f"body {length} bytes exceeds cap {max_body_bytes}"})
                return
            ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip().lower()
            if ctype == "application/octet-stream":
                self._handle_post_raw(length)
                return
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
                from toad_tpu.cli.common import parse_sex

                sex = parse_sex(body.get("sex", ""))
                if "bag_path" in body and not bag_paths_ok:
                    self._send(
                        403,
                        {"error": "server-side bag_path disabled: start with --bag_root to serve bags on a network-exposed host"},
                    )
                    return
                if self.path == "/heatmap":
                    if "bag_path" not in body:
                        raise ValueError("heatmap requires 'bag_path' (needs patch coordinates)")
                    png = service.heatmap_png(
                        body["bag_path"],
                        sex,
                        patch_size=int(body.get("patch_size", 256)),
                        downscale=int(body.get("downscale", 32)),
                        task=str(body.get("task", "origin")),
                    )
                    self._send_bytes(png)  # outside the error mapping: a client
                    return  # disconnect mid-write must not trigger a second response
                top_k = int(body.get("top_k", 5))
                attention = bool(body.get("attention", False))
                if "bag_path" in body:
                    out = service.predict_bag(body["bag_path"], sex, top_k, attention)
                elif "features_int8_b64" in body:
                    xq, sx = _decode_features_int8(body, service.model_cfg.in_dim)
                    out = service.predict_quantized_features(xq, sx, sex, top_k, attention)
                else:
                    feats = _decode_features(body, service.model_cfg.in_dim)
                    out = service.predict_features(feats, sex, top_k, attention)
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
                return
            except PermissionError:
                self._send(403, {"error": "bag_path outside the served bag root"})
                return
            except FileNotFoundError:
                # no raw-path echo: existence probing outside bag_root must
                # not leak host filesystem structure
                self._send(404, {"error": "feature bag not found"})
                return
            except Exception as e:  # device/runtime failure
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, out)

        def _handle_post_raw(self, length: int):
            """Raw-binary /predict (application/octet-stream): body is the
            feature bytes, metadata in X-Toad-* headers, response JSON."""
            if self.path != "/predict":
                # reject without reading the (possibly large) body; close so
                # the unread bytes can't be misparsed as a pipelined request
                self.close_connection = True
                self._send(400, {"error": "octet-stream bodies are only accepted on /predict"})
                return
            try:
                body = self.rfile.read(length)
                from toad_tpu.cli.common import parse_sex

                sex = parse_sex(self.headers.get("X-Toad-Sex", ""))
                top_k = int(self.headers.get("X-Toad-Top-K", 5))
                attention = (self.headers.get("X-Toad-Attention") or "0").strip().lower() in (
                    "1", "true", "yes",
                )
                feats, scales = _decode_raw_request(self.headers, body, service.model_cfg.in_dim)
                if scales is not None:
                    out = service.predict_quantized_features(feats, scales, sex, top_k, attention)
                else:
                    out = service.predict_features(feats, sex, top_k, attention)
            except (ValueError, KeyError) as e:
                self._send(400, {"error": str(e)})
                return
            except Exception as e:  # device/runtime failure
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, out)

    return DrainableHTTPServer((host, port), Handler)


def serve_in_thread(service: InferenceService, host: str = "127.0.0.1", port: int = 0):
    """Start the HTTP server on a daemon thread; returns (server, port).
    Used by tests and by embedders that run serving next to other work."""
    server = make_http_server(service, host, port)
    t = threading.Thread(target=server.serve_forever, name="toad-serve-http", daemon=True)
    t.start()
    return server, server.server_address[1]
