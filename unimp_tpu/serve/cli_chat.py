"""Terminal streaming chat client (reference pipeline/serve/cli.py).

Talks to a worker (directly or through the controller) and renders the
NUL-delimited JSON chunk stream incrementally.
"""

from __future__ import annotations

import argparse
import json
import sys

from unimp_tpu.serve.constants import STREAM_DELIMITER
from unimp_tpu.serve.conversation import get_conv_template


def stream_request(addr: str, payload: dict):
    import requests

    with requests.post(
        addr + "/worker_generate_stream", json=payload, stream=True,
        # read timeout must cover the worker's FIRST wave compile (the
        # batched engine emits no bytes until prefill+step are compiled;
        # several minutes on a cold remote TPU)
        timeout=900,
    ) as r:
        buf = b""
        for chunk in r.iter_content(chunk_size=None):
            buf += chunk
            while STREAM_DELIMITER in buf:
                part, buf = buf.split(STREAM_DELIMITER, 1)
                if part:
                    yield json.loads(part)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--worker-address", default="http://localhost:21002")
    p.add_argument("--model", default="unimp")
    p.add_argument("--template", default="unimp")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max-new-tokens", type=int, default=128)
    args = p.parse_args(argv)

    conv = get_conv_template(args.template)
    print("UniMP-TPU chat — ctrl-d to exit")
    while True:
        try:
            user = input(f"{conv.roles[0]}: ")
        except EOFError:
            break
        conv.append_message(conv.roles[0], user)
        conv.append_message(conv.roles[1], None)
        payload = {
            "model": args.model,
            "prompt": conv.get_prompt(),
            "temperature": args.temperature,
            "max_new_tokens": args.max_new_tokens,
        }
        shown = 0
        text = ""
        for chunk in stream_request(args.worker_address, payload):
            if chunk.get("error_code"):
                print(f"[error] {chunk['text']}")
                break
            text = chunk["text"]
            sys.stdout.write(text[shown:])
            sys.stdout.flush()
            shown = len(text)
        print()
        conv.messages[-1][1] = text


if __name__ == "__main__":
    main()
