"""Manual smoke client (reference pipeline/serve/test_message.py):
registers nothing; lists models via the controller and streams one
generation end-to-end."""

from __future__ import annotations

import argparse
import json

from unimp_tpu.serve.cli_chat import stream_request


def main(argv=None):
    import requests

    p = argparse.ArgumentParser()
    p.add_argument("--controller-address", default="http://localhost:21001")
    p.add_argument("--model", default=None)
    p.add_argument("--prompt", default="What is the next item recommended to the user? <answer>")
    args = p.parse_args(argv)

    r = requests.post(args.controller_address + "/list_models", json={},
                      timeout=10)
    models = r.json()["models"]
    print(f"models: {models}")
    model = args.model or (models[0] if models else None)
    if model is None:
        print("no workers registered")
        return
    for chunk in stream_request(
        args.controller_address,
        {"model": model, "prompt": args.prompt, "max_new_tokens": 16},
    ):
        print(json.dumps(chunk))


if __name__ == "__main__":
    main()
