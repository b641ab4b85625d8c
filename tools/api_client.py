"""HTTP API client (ref /root/reference/tools/api_client.py): msgpack POST to
/v1/tts, saves or streams the audio."""

from __future__ import annotations

import argparse
import base64
import sys
from pathlib import Path

import msgpack
import urllib.request


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--url", default="http://127.0.0.1:8080/v1/tts")
    p.add_argument("--text", "-t", default="Hello from the client.")
    p.add_argument("--output", "-o", type=Path, default=Path("generated.wav"))
    p.add_argument("--reference-id", default=None)
    p.add_argument("--reference-audio", "-ra", action="append", type=Path)
    p.add_argument("--reference-text", "-rt", action="append")
    p.add_argument("--format", default="wav", choices=["wav", "pcm"])
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--chunk-length", type=int, default=200)
    p.add_argument("--top-p", type=float, default=0.8)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--api-key", default=None)
    args = p.parse_args()

    references = []
    if args.reference_audio:
        texts = args.reference_text or [""] * len(args.reference_audio)
        for audio_path, text in zip(args.reference_audio, texts):
            references.append({"audio": audio_path.read_bytes(), "text": text})

    payload = {
        "text": args.text,
        "format": args.format,
        "streaming": args.streaming,
        "max_new_tokens": args.max_new_tokens,
        "chunk_length": args.chunk_length,
        "top_p": args.top_p,
        "temperature": args.temperature,
        "references": references,
    }
    if args.reference_id:
        payload["reference_id"] = args.reference_id
    if args.seed is not None:
        payload["seed"] = args.seed

    headers = {"Content-Type": "application/msgpack"}
    if args.api_key:
        headers["Authorization"] = f"Bearer {args.api_key}"

    req = urllib.request.Request(args.url, data=msgpack.packb(payload),
                                 headers=headers)
    try:
        resp = urllib.request.urlopen(req, timeout=600)
    except urllib.error.HTTPError as e:
        print(f"HTTP {e.code}: {e.read().decode()[:500]}", file=sys.stderr)
        sys.exit(1)

    with open(args.output, "wb") as f:
        while True:
            chunk = resp.read(65536)
            if not chunk:
                break
            f.write(chunk)
    print(f"saved {args.output} ({args.output.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
