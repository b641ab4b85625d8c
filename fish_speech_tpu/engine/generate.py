"""Long-text generation driver + end-to-end TTS engine.

Re-implements the reference `generate_long` flow
(/root/reference/fish_speech/models/text2semantic/inference.py:454-733):
speaker-tag splitting, byte/speaker-bounded batching, a system prompt carrying
the voice-cloning reference (text + VQ codes), and per-batch conversation
growth for multi-turn voice consistency. The device side is one jitted
prefill+decode program (models/decode.py) and one jitted vocoder call —
codes stay on device between them.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Iterator, Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import DualARConfig
from ..models.decode import SamplingConfig, generate
from ..ops.sampling import semantic_logit_bias
from ..text.content import TextPart, VQPart
from ..text.conversation import Conversation, Message
from ..text.tokenizer import IM_END_TOKEN


def split_text_by_speaker(text: str) -> list[str]:
    """Split into turns on <|speaker:N|> tags (ref inference.py:454-482)."""
    pattern = r"(<\|speaker:\d+\|>)"
    parts = re.split(pattern, text)
    turns = []
    i = 0
    while i < len(parts):
        part = parts[i].strip()
        if re.match(pattern, part):
            if i + 1 < len(parts):
                turns.append((part + parts[i + 1]).strip())
                i += 2
            else:
                turns.append(part)
                i += 1
        else:
            i += 1
    return turns


def group_turns_into_batches(turns: list[str], max_speakers: int = 5,
                             max_bytes: int = 300) -> list[str]:
    """Group turns under byte/speaker limits (ref inference.py:485-520)."""
    batches, current, current_bytes = [], [], 0
    for turn in turns:
        turn_bytes = len(turn.encode("utf-8"))
        if len(current) >= max_speakers or (current_bytes + turn_bytes > max_bytes
                                            and current):
            batches.append("\n".join(current))
            current, current_bytes = [turn], turn_bytes
        else:
            current.append(turn)
            current_bytes += turn_bytes
    if current:
        batches.append("\n".join(current))
    return batches


@dataclass
class GenerateLongRequest:
    text: str
    max_new_tokens: int = 0          # 0 = up to max_seq_len
    top_p: float = 0.9
    top_k: int = 30
    temperature: float = 1.0
    chunk_length: int = 300          # max bytes per batch
    prompt_text: list[str] | None = None          # voice-clone reference text
    prompt_tokens: list[np.ndarray] | None = None  # (K, T) codes per reference
    seed: int = 42


@dataclass
class GenerateResponse:
    action: Literal["sample", "next"]
    codes: np.ndarray | None = None   # (K, T)
    text: str | None = None
    tokens_generated: int = 0
    wall_s: float = 0.0


def build_base_conversation(prompt_text: list[str] | None,
                            prompt_tokens: list[np.ndarray] | None) -> Conversation:
    """System message, optionally with the voice-cloning reference
    (ref inference.py:562-598)."""
    conv = Conversation()
    if prompt_text and prompt_tokens:
        tagged = []
        for i, t in enumerate(prompt_text):
            if not re.search(r"<\|speaker:\d+\|>", t):
                tagged.append(f"<|speaker:{i}|>{t}")
            else:
                tagged.append(t)
        parts = [
            TextPart(text="convert the provided text to speech reference to "
                          "the following:\n\nText:\n"),
            TextPart(text="\n".join(tagged)),
            TextPart(text="\n\nSpeech:\n"),
            VQPart(codes=np.concatenate(prompt_tokens, axis=1)),
        ]
    else:
        parts = [TextPart(text="convert the provided text to speech")]
    conv.append(Message(role="system", parts=parts, add_im_start=True,
                        add_im_end=True))
    return conv


class TTSEngine:
    """text -> codes (-> waveform, when codec params are attached).

    With `scheduler_slots > 0`, generation goes through the continuous-
    batching scheduler: concurrent calls from different threads share decode
    ticks instead of serializing whole utterances.
    """

    def __init__(self, params: dict, cfg: DualARConfig, tokenizer,
                 codec_params: dict | None = None, codec_cfg=None,
                 cache_len: int | None = None, scheduler_slots: int = 0,
                 scheduler_chunk: int = 1, prefill_chunk: int | None = None,
                 vocoder_impl: str = "pallas", multihost: bool = False):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # stream-step widths already warmed this process (stream_tts's
        # speculative warm start is once per width, not per request)
        self._stream_warm_widths: set = set()
        self.codec_params = codec_params
        self.codec_cfg = codec_cfg
        self.cache_len = cache_len or cfg.max_seq_len
        self.scheduler = None
        self._next_request_id = 0
        self.scheduler_slots = scheduler_slots
        self.im_end_id = tokenizer.get_token_id(IM_END_TOKEN)
        self._bias = semantic_logit_bias(
            cfg.vocab_size, cfg.semantic_begin_id, cfg.semantic_end_id,
            self.im_end_id)
        if codec_params is not None:
            from ..codec.model import dac_encode

            # serving vocoder impl: "pallas" (fused kernels, ~2x the lax
            # path steady-state on chip), "lax", "mm", or "auto" (probe
            # steady state of pallas vs lax at first use and keep the
            # faster — insurance against runtime dispatch pathologies, the
            # round-3 bench lesson). Use warmup_vocoder() at server start:
            # the remote runtime charges a one-time ~40 s cost on the
            # SECOND call of a many-custom-call program, which must not
            # land on a user request.
            self._vocoder_fns: dict = {}
            self._packed_decoder = None
            if vocoder_impl == "auto":
                vocoder_impl = self._select_vocoder_impl()
            self.vocoder_impl = vocoder_impl
            self._jit_vocoder = self._vocoder_fn(vocoder_impl)
            self._jit_encoder = jax.jit(
                lambda p, w: dac_encode(p, self.codec_cfg, w))

        if scheduler_slots > 0:
            from .scheduler import ContinuousBatcher, SchedulerThread

            # prefill_chunk: prompts longer than this prefill one chunk per
            # scheduler tick, interleaved with decode ticks, so a cold long
            # prompt never stalls in-flight streams for more than one
            # chunk's dispatch (SGLang's chunked prefill plays this role in
            # the reference stack, ref README.md:133)
            batcher = ContinuousBatcher(
                params, cfg, num_slots=scheduler_slots,
                cache_len=self.cache_len, im_end_id=self.im_end_id,
                bias=self._bias,
                prefill_chunk=None if multihost else prefill_chunk)
            if multihost:
                # leader (process 0) owns HTTP and drives all hosts via
                # broadcast TickPlans; followers hold the batcher only —
                # tools/api_server.py runs their mirror loop
                # (serve.multihost.run_follower_loop)
                if jax.process_index() == 0:
                    from ..serve.multihost import MultihostSchedulerThread

                    self.scheduler = MultihostSchedulerThread(
                        batcher, chunk_steps=max(1, scheduler_chunk))
                else:
                    self.follower_batcher = batcher
            else:
                self.scheduler = SchedulerThread(batcher,
                                                 chunk_steps=scheduler_chunk)

    # -- vocoder impl selection / warmup -----------------------------------
    def _vocoder_fn(self, impl: str):
        """Jitted (params, codes (B,K+1,T)) -> wav, cached per impl."""
        if impl not in self._vocoder_fns:
            if impl == "pallas":
                from ..codec.fastpath import (
                    dac_from_indices_pallas,
                    pack_decoder,
                )

                if self._packed_decoder is None:
                    self._packed_decoder = jax.jit(
                        lambda p: pack_decoder(p["decoder"], self.codec_cfg))(
                        self.codec_params)
                fn = jax.jit(lambda p, c: dac_from_indices_pallas(
                    p, self.codec_cfg, c, packed=self._packed_decoder))
            elif impl == "mm":
                from ..codec.fastpath import dac_from_indices_mm

                fn = jax.jit(lambda p, c: dac_from_indices_mm(
                    p, self.codec_cfg, c))
            elif impl == "lax":
                from ..codec.model import dac_from_indices

                fn = jax.jit(lambda p, c: dac_from_indices(
                    p, self.codec_cfg, c))
            else:
                raise ValueError(f"unknown vocoder impl: {impl}")
            self._vocoder_fns[impl] = fn
        return self._vocoder_fns[impl]

    def _select_vocoder_impl(self, probe_frames: int = 64) -> str:
        """Measure pallas vs lax steady state (shared probe policy,
        utils/probing.py) and return the faster — a dispatch pathology can
        then never make serving slower than the plain-XLA path."""
        from ..utils.probing import steady_state_winner

        n_q = self.codec_cfg.rvq.total_codebooks
        codes = jnp.zeros((1, n_q, probe_frames), jnp.int32)

        def candidate(impl):
            fn = self._vocoder_fn(impl)
            return lambda: np.asarray(fn(self.codec_params, codes))

        winner, _ = steady_state_winner(
            {impl: candidate(impl) for impl in ("pallas", "lax")})
        return winner

    def warmup_vocoder(self, buckets=((1, 32), (8, 64)),
                       stream_widths=(4, 16)) -> None:
        """Compile + run the serving vocoder TWICE per (batch, frame) bucket
        so neither the compile nor the runtime's one-time second-call cost
        lands on a user request. With the scheduler enabled, also warms the
        stateful STREAM-step programs for the stream_tts chunk widths
        (first-chunk + steady), so time-to-first-audio never pays a
        compile."""
        n_q = self.codec_cfg.rvq.total_codebooks
        for bb, frames in buckets:
            codes = jnp.zeros((bb, n_q, frames), jnp.int32)
            for _ in range(2):
                np.asarray(self._jit_vocoder(self.codec_params, codes))
        if self.scheduler is not None and stream_widths:
            from ..codec.streaming import StatefulVocoder

            voc = StatefulVocoder(self.codec_params, self.codec_cfg,
                                  chunk_frames=max(stream_widths))
            for w in sorted(set(stream_widths)):
                z = jnp.zeros((1, n_q, w), jnp.int32)
                for _ in range(2):
                    np.asarray(voc._step(self.codec_params, voc.state, z)[0])
                self._stream_warm_widths.add(w)

    def _system_prefix(self, conversation) -> tuple[str, int]:
        """(prefix_id, prefix_len) for the shared system prompt — the ONE
        derivation both generate_long and stream_tts must use, or the two
        paths stop sharing prefix KV cache entries (scheduler keys by this
        sha256)."""
        import hashlib

        sys_encoded = conversation.encode_for_inference(
            self.tokenizer, num_codebooks=self.cfg.num_codebooks)
        pid = hashlib.sha256(
            np.ascontiguousarray(sys_encoded).tobytes()).hexdigest()[:16]
        return pid, sys_encoded.shape[1]

    def _generate_codes(self, padded: np.ndarray, start: int, max_new: int,
                        req: "GenerateLongRequest", key, *,
                        prefix_id: str | None = None,
                        prefix_len: int = 0) -> np.ndarray:
        """One segment: (K+1, Tpad) left-padded prompt -> (K+1, n) codes."""
        if self.scheduler is not None:
            from .scheduler import SlotRequest

            self._next_request_id += 1
            slot_req = SlotRequest(
                request_id=self._next_request_id,
                prompt=padded[:, start:], max_new_tokens=max_new,
                temperature=req.temperature, top_p=req.top_p,
                top_k=req.top_k,
                prefix_id=prefix_id, prefix_len=prefix_len)
            self.scheduler.submit(slot_req)
            if not slot_req.done.wait(timeout=3600):
                raise TimeoutError("scheduler request timed out")
            if slot_req.error is not None:
                raise slot_req.error
            if not slot_req.result:
                return np.zeros((padded.shape[0], 0), np.int32)
            return np.stack(slot_req.result, axis=1)

        sampling = SamplingConfig.create(req.temperature, req.top_p)
        codes_buf, lengths = generate(
            self.params, self.cfg, jnp.asarray(padded)[None],
            jnp.asarray([start], jnp.int32), key, sampling, self._bias,
            max_new_tokens=max_new, im_end_id=self.im_end_id,
            top_k=req.top_k, cache_len=self.cache_len)
        n_valid = int(lengths[0])
        return np.asarray(codes_buf[0, :, :n_valid])

    # -- codes -> audio ----------------------------------------------------
    def decode_codes(self, codes: np.ndarray) -> np.ndarray:
        from ..codec.model import dac_from_indices

        assert self.codec_params is not None, "no codec attached"
        # bucket the frame count so the jitted vocoder is reused across
        # lengths: the codec is fully causal, so right-padding the codes
        # cannot change the prefix (tested: streaming-prefix invariant)
        n = codes.shape[1]
        bucket = max(32, -(-n // 64) * 64)
        padded = np.zeros((codes.shape[0], bucket), dtype=np.int32)
        padded[:, :n] = codes
        wav = self._jit_vocoder(self.codec_params, jnp.asarray(padded)[None])
        return np.asarray(wav[0, : n * self.codec_cfg.frame_length])

    def decode_codes_batch(self, codes_list: list[np.ndarray],
                           micro_batch: int = 8) -> list[np.ndarray]:
        """Vocode many (K+1, T_i) code sequences with pad-and-batch micro
        batches of up to `micro_batch` per jitted dispatch (one program per
        (batch, frame-bucket) instead of one dispatch per item — the
        reference server micro-batches its VQGAN decodes the same way,
        ref tools/server/model_utils.py:69-86). The batch dimension is
        bucketed to the next power of two <= micro_batch, so a
        single-sequence request pays 1x the vocoder FLOPs, not 8x."""
        from ..codec.model import dac_from_indices  # noqa: F401 (jit below)

        assert self.codec_params is not None, "no codec attached"
        fl = self.codec_cfg.frame_length
        out: list[np.ndarray | None] = [None] * len(codes_list)
        # process in submission order groups (padding to the group max keeps
        # the pad waste bounded by the group's length spread)
        for lo in range(0, len(codes_list), micro_batch):
            group = codes_list[lo:lo + micro_batch]
            lens = [c.shape[1] for c in group]
            bucket = max(32, -(-max(lens) // 64) * 64)
            bb = 1
            while bb < len(group):
                bb *= 2
            padded = np.zeros((bb, group[0].shape[0], bucket), np.int32)
            for i, c in enumerate(group):
                padded[i, :, : c.shape[1]] = c
            wav = np.asarray(
                self._jit_vocoder(self.codec_params, jnp.asarray(padded)))
            for i, n in enumerate(lens):
                out[lo + i] = wav[i, : n * fl]
        return out  # type: ignore[return-value]

    # -- audio -> codes (voice-cloning prompt) -----------------------------
    def encode_reference(self, wav: np.ndarray) -> np.ndarray:
        from ..codec.model import dac_encode

        assert self.codec_params is not None, "no codec attached"
        # bucket samples (causal encoder: zero right-pad never changes the
        # prefix codes) so the jitted encoder is reused across lengths
        fl = self.codec_cfg.frame_length
        n_frames = -(-len(wav) // fl)
        bucket_frames = max(32, -(-n_frames // 64) * 64)
        padded = np.zeros(bucket_frames * fl, dtype=np.float32)
        padded[: len(wav)] = wav
        res = self._jit_encoder(self.codec_params, jnp.asarray(padded)[None])
        return np.asarray(res.codes[0, :, :n_frames])

    # -- long-text driver --------------------------------------------------
    def generate_long(self, req: GenerateLongRequest) -> Iterator[GenerateResponse]:
        cfg = self.cfg
        max_length = self.cache_len

        conversation = build_base_conversation(req.prompt_text, req.prompt_tokens)

        turns = split_text_by_speaker(req.text)
        batches = (group_turns_into_batches(turns, max_speakers=5,
                                            max_bytes=req.chunk_length)
                   if turns else [req.text])

        # system prompt (voice-clone reference) is identical across segments:
        # on the scheduler path, mark it so the prefix KV cache prefills it
        # once per reference instead of per segment (same radix-style reuse
        # stream_tts gets; VERDICT r4 weak #5 — the buffered path used to
        # re-prefill the shared prefix every segment)
        prefix_id = None
        prefix_len = 0
        if self.scheduler is not None:
            prefix_id, prefix_len = self._system_prefix(conversation)

        key = jax.random.key(req.seed)

        for batch_idx, batch_text in enumerate(batches):
            conversation.append(Message(
                role="user", parts=[TextPart(text=batch_text)],
                add_im_start=True, add_im_end=True))

            conv_gen = conversation.copy()
            conv_gen.append(Message(role="assistant", parts=[],
                                    modality="voice", add_im_start=True,
                                    add_im_end=False))

            encoded = conv_gen.encode_for_inference(
                self.tokenizer, num_codebooks=cfg.num_codebooks)
            prompt_len = encoded.shape[1]
            if prompt_len > max_length - 2048 and max_length > 4096:
                raise ValueError(
                    f"Prompt is too long: {prompt_len} > {max_length - 2048}")

            # bucket the prompt length (left-pad) so the jitted program is
            # reused across requests instead of recompiling per length
            bucket = max(64, -(-prompt_len // 256) * 256)
            bucket = min(bucket, max_length - 64)
            padded = np.zeros((encoded.shape[0], bucket), dtype=np.int32)
            padded[:, bucket - prompt_len:] = encoded[:, :prompt_len]
            start = bucket - prompt_len

            max_new = self.cache_len - bucket
            if req.max_new_tokens:
                max_new = min(max_new, -(-req.max_new_tokens // 256) * 256)

            t0 = time.perf_counter()
            key, sub = jax.random.split(key)
            full = self._generate_codes(padded, start, max_new, req, sub,
                                        prefix_id=prefix_id,
                                        prefix_len=prefix_len)
            n_valid = full.shape[1]
            if req.max_new_tokens:
                n_valid = min(n_valid, req.max_new_tokens)
            wall = time.perf_counter() - t0

            codes = full[1:, :n_valid]
            assert (codes >= 0).all(), "negative code generated"

            # grow the conversation with the assistant turn for consistency
            conversation.append(Message(
                role="assistant", parts=[VQPart(codes=codes)],
                modality="voice", add_im_start=True, add_im_end=True))

            yield GenerateResponse(action="sample", codes=codes,
                                   text=batch_text,
                                   tokens_generated=n_valid + 1, wall_s=wall)

        yield GenerateResponse(action="next")

    # -- one-call TTS ------------------------------------------------------
    def tts(self, req: GenerateLongRequest) -> np.ndarray:
        """Full text -> waveform (concatenated over batches)."""
        segs = [r.codes for r in self.generate_long(req) if r.action == "sample"]
        merged = np.concatenate(segs, axis=1)
        return self.decode_codes(merged)

    # -- token-level streaming TTS ----------------------------------------
    def stream_tts(self, req: GenerateLongRequest,
                   chunk_frames: int = 16,
                   first_chunk_frames: int | None = 4
                   ) -> "Iterator[np.ndarray]":
        """Yield waveform chunks while tokens are still being decoded.

        Requires the continuous-batching scheduler + codec. Audio is emitted
        every `chunk_frames` acoustic frames (~chunk_frames/21.5 s) through
        the exact streaming vocoder, so time-to-first-audio is prefill + one
        chunk of decoding instead of a whole segment (contrast the
        reference's per-segment handoff, inference_engine/__init__.py:86-119).

        first_chunk_frames: the FIRST audio chunk is cut at this smaller
        frame count (then the stream grows to `chunk_frames`), trading a
        touch of steady-state dispatch efficiency for ~(chunk_frames -
        first)/21.5 s lower time-to-first-audio. None/>=chunk disables.
        """
        import queue as _queue

        from ..codec.streaming import StatefulVocoder
        from .scheduler import SlotRequest

        assert self.scheduler is not None, "stream_tts needs scheduler_slots>0"
        assert self.codec_params is not None, "no codec attached"

        conversation = build_base_conversation(req.prompt_text, req.prompt_tokens)
        turns = split_text_by_speaker(req.text)
        batches = (group_turns_into_batches(turns, max_speakers=5,
                                            max_bytes=req.chunk_length)
                   if turns else [req.text])

        # the system prompt (voice-clone reference) is identical across all
        # segment requests -> mark it so the scheduler's prefix KV cache
        # prefills it once per reference (radix-prefix-cache analog)
        prefix_id, prefix_len = self._system_prefix(conversation)

        # stateful: each emitted frame is vocoded exactly once (the windowed
        # StreamingVocoder fallback re-decodes a history window per chunk —
        # ~12x redundant vocoder FLOPs at chunk_frames=16)
        vocoder = StatefulVocoder(self.codec_params, self.codec_cfg,
                                  chunk_frames=chunk_frames)
        first = (first_chunk_frames
                 if first_chunk_frames and first_chunk_frames < chunk_frames
                 else None)
        if first:
            vocoder.chunk = first  # grows back to chunk_frames after cut 1

        # vocoder worker: jitted StatefulVocoder dispatches run on their own
        # thread so the request thread only moves token columns and yields
        # audio — with several concurrent streaming clients the per-chunk
        # vocoder host time no longer serializes against column collection
        # (the device itself still interleaves with the scheduler's ticks)
        import threading as _threading

        _DONE = object()
        voc_in: "_queue.Queue" = _queue.Queue()
        voc_out: "_queue.Queue" = _queue.Queue()

        def _voc_worker():
            try:
                # speculative warm start: run the stream-step programs for
                # both chunk widths on a THROWAWAY state while the LM is
                # still prefilling, so neither the compile nor the remote
                # runtime's one-time second-call cost (COLD_START.md) lands
                # between the first decoded frames and the first audio.
                # Once per process per width (the jitted step is shared
                # across StatefulVocoder instances): re-warming on every
                # request would cost ~4 blocking dispatches competing with
                # live decode ticks — and could itself delay first audio.
                try:
                    from ..codec.streaming import init_vocoder_state

                    widths = sorted({first or chunk_frames, chunk_frames})
                    todo = [w for w in widths
                            if w not in self._stream_warm_widths]
                    if todo:
                        st0 = init_vocoder_state(self.codec_params,
                                                 self.codec_cfg, batch=1)
                        n_q = self.codec_cfg.rvq.total_codebooks
                        for w in todo:
                            z = jnp.zeros((1, n_q, w), jnp.int32)
                            for _ in range(2):
                                np.asarray(vocoder._step(
                                    self.codec_params, st0, z)[0])
                            self._stream_warm_widths.add(w)
                        del st0
                except Exception:
                    pass  # warm-start is best-effort; real feed compiles
                while True:
                    item = voc_in.get()
                    if item is None:
                        for w in vocoder.feed(final=True):
                            voc_out.put(w)
                        break
                    for w in vocoder.feed(item):
                        voc_out.put(w)
                        vocoder.chunk = chunk_frames  # first cut done
            except Exception as e:  # surfaced by the generator below
                voc_out.put(e)
            voc_out.put(_DONE)

        worker = _threading.Thread(target=_voc_worker, daemon=True)
        worker.start()

        slot_req = None
        try:
            for batch_text in batches:
                conversation.append(Message(
                    role="user", parts=[TextPart(text=batch_text)],
                    add_im_start=True, add_im_end=True))
                conv_gen = conversation.copy()
                conv_gen.append(Message(role="assistant", parts=[],
                                        modality="voice", add_im_start=True,
                                        add_im_end=False))
                encoded = conv_gen.encode_for_inference(
                    self.tokenizer, num_codebooks=self.cfg.num_codebooks)

                cols: "_queue.Queue" = _queue.Queue()
                self._next_request_id += 1
                max_new = req.max_new_tokens or (self.cache_len
                                                 - encoded.shape[1] - 1)
                slot_req = SlotRequest(
                    request_id=self._next_request_id, prompt=encoded,
                    max_new_tokens=max_new, temperature=req.temperature,
                    top_p=req.top_p, top_k=req.top_k,
                    prefix_id=prefix_id, prefix_len=prefix_len,
                    on_token=lambda rid, col: cols.put(col))
                self.scheduler.submit(slot_req)

                pending: list[np.ndarray] = []
                done = False
                # hand the first (smaller) chunk to the vocoder as soon as
                # it exists; steady state batches chunk_frames per handoff
                send_at = first or chunk_frames
                while not done or not cols.empty():
                    try:
                        col = cols.get(timeout=0.05)
                        pending.append(col[1:])  # drop the token row
                    except _queue.Empty:
                        done = slot_req.done.is_set()
                    if len(pending) >= send_at:
                        voc_in.put(np.stack(pending, axis=1))
                        pending = []
                        send_at = chunk_frames
                    # yield whatever audio the vocoder worker has ready
                    while True:
                        try:
                            w = voc_out.get_nowait()
                        except _queue.Empty:
                            break
                        if isinstance(w, Exception):
                            raise w
                        yield w
                    done = done or slot_req.done.is_set()
                if slot_req.error is not None:
                    raise slot_req.error
                if pending:
                    voc_in.put(np.stack(pending, axis=1))
                # segment boundary: append assistant turn for voice consistency
                if slot_req.result:
                    seg_codes = np.stack(slot_req.result, axis=1)[1:]
                    conversation.append(Message(
                        role="assistant", parts=[VQPart(codes=seg_codes)],
                        modality="voice", add_im_start=True, add_im_end=True))
            # flush the vocoder tail and drain the worker
            voc_in.put(None)
            while True:
                w = voc_out.get()
                if w is _DONE:
                    break
                if isinstance(w, Exception):
                    raise w
                yield w
            worker.join(timeout=60)
        finally:
            if slot_req is not None and not slot_req.done.is_set():
                # abandoned stream (client disconnect / generator close):
                # free the decode slot — otherwise it decodes to its full
                # token budget, wasting tick capacity for every live stream
                slot_req.cancel()
            if worker.is_alive():
                # unblock the vocoder worker so it exits instead of leaking
                voc_in.put(None)
