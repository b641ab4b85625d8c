"""HTTP serving layer (aiohttp) matching the reference API surface.

Routes mirror /root/reference/tools/server/views.py:58-480:
  GET  /v1/health
  POST /v1/tts                    (msgpack or JSON; wav/pcm, buffered or chunked)
  POST /v1/vqgan/encode           audio bytes -> RVQ codes
  POST /v1/vqgan/decode           RVQ codes  -> PCM f16 bytes
  POST /v1/references/add         save a voice reference
  GET  /v1/references/list
  DELETE /v1/references/delete

Concurrency model: the reference dedicates one model-owner thread fed by a
queue (inference.py:748-799). Here the device is owned either by a
single-worker executor (one request at a time) or — when the engine is
built with a continuous-batching scheduler (engine/scheduler.py) — by the
scheduler thread, which interleaves many requests' decode ticks and
chunked prefills; the asyncio loop streams bytes to any number of clients
in both modes.
"""

from __future__ import annotations

import asyncio
import hashlib
import json
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor

import msgpack
import numpy as np
from aiohttp import web

from ..engine.generate import GenerateLongRequest, TTSEngine
from .references import ReferenceStore
from .schema import (
    AddReferenceRequest,
    ServeTTSRequest,
    ServeVQGANDecodeRequest,
    ServeVQGANEncodeRequest,
    UpdateReferenceRequest,
)
from .wav import decode_audio_bytes, encode_wav, float_to_pcm16, wav_chunk_header


async def _parse_body(request: web.Request, model_cls):
    ctype = request.content_type
    raw = await request.read()
    if ctype == "application/msgpack":
        data = msgpack.unpackb(raw, raw=False)
    else:
        data = json.loads(raw)
    return model_cls.model_validate(data)


def _json_default(o):
    if isinstance(o, bytes):
        import base64

        return base64.b64encode(o).decode()
    raise TypeError(f"unserializable: {type(o)}")


def _respond(request: web.Request, payload: dict) -> web.Response:
    accept = request.headers.get("accept", "application/json")
    if "application/msgpack" in accept:
        return web.Response(body=msgpack.packb(payload),
                            content_type="application/msgpack")
    return web.json_response(
        text=json.dumps(payload, default=_json_default))


class TTSApp:
    def __init__(self, engine: TTSEngine, ref_store: ReferenceStore | None = None,
                 api_key: str | None = None):
        self.engine = engine
        self.ref_store = ref_store
        self.api_key = api_key
        # without the continuous-batching scheduler, one model-owner worker
        # serializes all device work (ref inference.py:748-799); with it, the
        # scheduler thread owns decode and request threads may overlap
        workers = 4 if getattr(engine, "scheduler", None) is not None else 1
        self.executor = ThreadPoolExecutor(max_workers=workers,
                                           thread_name_prefix="model-worker")
        # /v1/vqgan/encode LRU (audio-bytes sha256 -> tokens); guarded by a
        # lock — up to `workers` executor threads touch it concurrently and
        # get/move_to_end/popitem sequences are not atomic
        import threading

        self._encode_cache: "OrderedDict[str, list]" = OrderedDict()
        self._encode_cache_cap = 32
        self._encode_cache_lock = threading.Lock()

    async def _run(self, fn, *args):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(self.executor, fn, *args)

    # -- middleware --------------------------------------------------------
    @web.middleware
    async def auth_middleware(self, request: web.Request, handler):
        if self.api_key is not None and request.path.startswith("/v1/"):
            token = request.headers.get("Authorization", "")
            if token != f"Bearer {self.api_key}":
                return web.json_response({"error": "Invalid token"}, status=401)
        return await handler(request)

    @web.middleware
    async def error_middleware(self, request: web.Request, handler):
        """Map errors to clean JSON (ref tools/server/exception_handler.py)."""
        import pydantic

        try:
            return await handler(request)
        except web.HTTPException:
            raise
        except pydantic.ValidationError as e:
            return web.json_response(
                {"error": "validation error", "detail": e.errors(
                    include_url=False, include_input=False)}, status=422)
        except (json.JSONDecodeError, ValueError, msgpack.exceptions.UnpackException) as e:
            return web.json_response(
                {"error": "malformed request body", "detail": str(e)}, status=400)
        except Exception as e:  # pragma: no cover
            return web.json_response(
                {"error": type(e).__name__, "detail": str(e)}, status=500)

    # -- routes ------------------------------------------------------------
    async def health(self, request: web.Request) -> web.Response:
        return _respond(request, {"status": "ok"})

    async def vqgan_encode(self, request: web.Request) -> web.Response:
        req = await _parse_body(request, ServeVQGANEncodeRequest)

        def work():
            # LRU on the raw audio bytes: reference prompts are re-encoded
            # on every request in naive serving; the reference server caches
            # them the same way (ref tools/server/model_utils.py:51-66)
            tokens = []
            for audio in req.audios:
                key = hashlib.sha256(audio).hexdigest()
                with self._encode_cache_lock:
                    hit = self._encode_cache.get(key)
                    if hit is not None:
                        self._encode_cache.move_to_end(key)
                if hit is not None:
                    tokens.append(hit)
                    continue
                wav = decode_audio_bytes(audio, self.engine.codec_cfg.sample_rate)
                t = self.engine.encode_reference(wav).tolist()
                with self._encode_cache_lock:
                    self._encode_cache[key] = t
                    while len(self._encode_cache) > self._encode_cache_cap:
                        self._encode_cache.popitem(last=False)
                tokens.append(t)
            return tokens

        tokens = await self._run(work)
        return _respond(request, {"tokens": tokens})

    async def vqgan_decode(self, request: web.Request) -> web.Response:
        req = await _parse_body(request, ServeVQGANDecodeRequest)

        def work():
            # pad-and-batch up to 8 sequences per jitted vocoder dispatch
            # (ref tools/server/model_utils.py:69-86 batch_vqgan_decode)
            codes = [np.asarray(c, dtype=np.int32) for c in req.tokens]
            wavs = self.engine.decode_codes_batch(codes)
            return [np.asarray(w, dtype=np.float16).tobytes() for w in wavs]

        audios = await self._run(work)
        return _respond(request, {"audios": audios})

    async def tts(self, request: web.Request) -> web.StreamResponse:
        req = await _parse_body(request, ServeTTSRequest)
        sample_rate = (self.engine.codec_cfg.sample_rate
                       if self.engine.codec_cfg else 44100)

        prompt_text: list[str] | None = None
        prompt_tokens: list[np.ndarray] | None = None
        if req.reference_id and self.ref_store is not None:
            loaded = await self._run(
                self.ref_store.load_by_id, req.reference_id,
                req.use_memory_cache == "on")
            prompt_text, prompt_tokens = loaded.texts, loaded.codes_list
        elif req.references:
            prompt_text, prompt_tokens = [], []
            for ref in req.references:
                prompt_text.append(ref.text)
                prompt_tokens.append(await self._run(
                    self.ref_store.encode_inline
                    if self.ref_store else self._inline_encode, ref.audio))

        text = req.text
        if req.normalize:
            from ..text.clean import clean_text
            text = clean_text(text)

        gen_req = GenerateLongRequest(
            text=text,
            max_new_tokens=req.max_new_tokens,
            top_p=req.top_p,
            temperature=req.temperature,
            chunk_length=req.chunk_length,
            prompt_text=prompt_text,
            prompt_tokens=prompt_tokens,
            seed=req.seed if req.seed is not None else 42,
        )

        if req.streaming and req.format not in ("wav", "pcm"):
            # mp3/opus need whole-signal encoder state; match the
            # reference's explicit rejection (views.py:167-171) instead of
            # silently mislabeling bytes
            raise web.HTTPBadRequest(
                text="Streaming only supports wav/pcm formats")

        if req.streaming:
            resp = web.StreamResponse(status=200, headers={
                "Content-Type": "audio/wav" if req.format == "wav"
                else "application/octet-stream",
                "Content-Disposition": "attachment; filename=audio.wav",
            })
            await resp.prepare(request)
            if req.format == "wav":
                await resp.write(wav_chunk_header(sample_rate=sample_rate))

            loop = asyncio.get_running_loop()
            queue: asyncio.Queue = asyncio.Queue()
            # set when the client goes away: the producer closes its
            # generator, which cancels the decode slot (stream_tts's
            # finally) — an abandoned stream must not decode to its full
            # token budget under continuous batching
            import threading

            client_gone = threading.Event()

            def produce():
                if self.engine.scheduler is not None:
                    # token-level streaming: audio every ~16 frames
                    gen = self.engine.stream_tts(gen_req)
                    emit = iter(gen)
                else:
                    gen = self.engine.generate_long(gen_req)
                    emit = (float_to_pcm16(self.engine.decode_codes(r.codes))
                            for r in gen if r.action == "sample")
                try:
                    for item in emit:
                        if client_gone.is_set():
                            return
                        body = (item if isinstance(item, bytes)
                                else float_to_pcm16(item))
                        loop.call_soon_threadsafe(queue.put_nowait, body)
                    loop.call_soon_threadsafe(queue.put_nowait, None)
                except Exception as e:  # surface errors to the stream consumer
                    loop.call_soon_threadsafe(queue.put_nowait, e)
                finally:
                    gen.close()  # cancels the slot on abandonment

            fut = loop.run_in_executor(self.executor, produce)
            try:
                while True:
                    chunk = await queue.get()
                    if chunk is None:
                        break
                    if isinstance(chunk, Exception):
                        raise web.HTTPInternalServerError(text=str(chunk))
                    await resp.write(chunk)
                await fut
                await resp.write_eof()
            except (ConnectionResetError, asyncio.CancelledError):
                client_gone.set()
                raise
            return resp

        def work():
            wav = self.engine.tts(gen_req)
            return wav

        wav = await self._run(work)
        if req.format == "pcm":
            return web.Response(body=float_to_pcm16(wav),
                                content_type="application/octet-stream")
        if req.format == "mp3":
            from .audio_codecs import encode_mp3, mp3_available

            if not mp3_available():
                raise web.HTTPBadRequest(
                    text="mp3 unavailable (libmp3lame not found)")
            body = await self._run(encode_mp3, wav, sample_rate)
            return web.Response(body=body, content_type="audio/mpeg")
        if req.format == "opus":
            from .audio_codecs import encode_opus, opus_available

            if not opus_available():
                raise web.HTTPBadRequest(
                    text="opus unavailable (libopus not found)")
            body = await self._run(encode_opus, wav, sample_rate)
            return web.Response(body=body, content_type="audio/ogg")
        return web.Response(body=encode_wav(wav, sample_rate),
                            content_type="audio/wav")

    def _inline_encode(self, audio_bytes: bytes) -> np.ndarray:
        wav = decode_audio_bytes(audio_bytes, self.engine.codec_cfg.sample_rate)
        return self.engine.encode_reference(wav)

    async def references_add(self, request: web.Request) -> web.Response:
        req = await _parse_body(request, AddReferenceRequest)
        if self.ref_store is None:
            return web.json_response({"success": False,
                                      "message": "no reference store"}, status=500)
        await self._run(self.ref_store.add, req.id, req.audio, req.text)
        return _respond(request, {"success": True, "message": "Reference added",
                                  "reference_id": req.id})

    async def references_list(self, request: web.Request) -> web.Response:
        ids = self.ref_store.list_ids() if self.ref_store else []
        return _respond(request, {"success": True, "reference_ids": ids,
                                  "message": "Success"})

    async def references_update(self, request: web.Request) -> web.Response:
        try:
            req = await _parse_body(request, UpdateReferenceRequest)
        except Exception as e:
            return web.json_response({"success": False,
                                      "message": f"bad request: {e}"},
                                     status=400)
        old_id, new_id = req.old_reference_id, req.new_reference_id
        if self.ref_store is None:
            return web.json_response({"success": False,
                                      "message": "no reference store"},
                                     status=500)
        import shutil

        src = self.ref_store.root / old_id
        if not src.is_dir():
            return _respond(request, {
                "success": False, "message": "Reference not found",
                "old_reference_id": old_id, "new_reference_id": new_id})
        shutil.move(str(src), str(self.ref_store.root / new_id))
        self.ref_store._id_cache.pop(old_id, None)
        return _respond(request, {
            "success": True, "message": "Reference renamed",
            "old_reference_id": old_id, "new_reference_id": new_id})

    async def references_delete(self, request: web.Request) -> web.Response:
        raw = await request.read()
        try:
            data = json.loads(raw)
            ref_id = data["reference_id"] if isinstance(data, dict) else str(data)
        except Exception:
            ref_id = raw.decode().strip('"')
        ok = self.ref_store.delete(ref_id) if self.ref_store else False
        return _respond(request, {
            "success": ok,
            "message": "Reference deleted" if ok else "Reference not found",
            "reference_id": ref_id})

    async def webui(self, request: web.Request) -> web.Response:
        from .webui import WEBUI_HTML

        return web.Response(text=WEBUI_HTML, content_type="text/html")

    def build(self) -> web.Application:
        app = web.Application(
            middlewares=[self.error_middleware, self.auth_middleware],
            client_max_size=256 * 1024 * 1024)
        app.router.add_get("/", self.webui)
        app.router.add_get("/ui", self.webui)
        app.router.add_get("/v1/health", self.health)
        app.router.add_post("/v1/health", self.health)
        app.router.add_post("/v1/tts", self.tts)
        app.router.add_post("/v1/vqgan/encode", self.vqgan_encode)
        app.router.add_post("/v1/vqgan/decode", self.vqgan_decode)
        app.router.add_post("/v1/references/add", self.references_add)
        app.router.add_get("/v1/references/list", self.references_list)
        app.router.add_post("/v1/references/update", self.references_update)
        app.router.add_delete("/v1/references/delete", self.references_delete)
        return app


def create_app(engine: TTSEngine, ref_dir: str | None = None,
               api_key: str | None = None) -> web.Application:
    store = None
    if ref_dir is not None and engine.codec_params is not None:
        store = ReferenceStore(ref_dir, engine.encode_reference,
                               engine.codec_cfg.sample_rate)
    return TTSApp(engine, store, api_key).build()
