"""CLI for the few-shot vision-language benchmark harness.

Argparse surface mirroring the inherited OpenFlamingo harness entry
(/root/reference/UniMP/pipeline/eval/evaluate.py:28-120 flags, :168
main: per-benchmark switches, shot counts, trial seeds, results file) —
TPU-native: the model is a UniMP checkpoint (Orbax), datasets are JSON
manifests (see evals/benchmark_harness.py), metrics are hermetic
(CIDEr-D / VQA rule / top-1), and everything runs jitted on device.

Usage:
    python -m unimp_tpu.cli.evaluate \
        --checkpoint_dir runs/x --checkpoint_name final_weights \
        --variant 4b-instruct --tokenizer_path tok.json \
        --eval_coco --coco_manifest coco_val.json \
        --shots 0 4 --results_file results.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", type=str, required=True,
                   help="Orbax checkpoint directory")
    p.add_argument("--checkpoint_name", type=str, default="final_weights")
    p.add_argument("--variant", type=str, default="4b-instruct",
                   help="model variant (models/config.py VARIANTS)")
    p.add_argument("--tokenizer_path", type=str, required=True)
    p.add_argument("--results_file", type=str, default=None,
                   help="JSON file to write all metrics to")
    p.add_argument("--shots", nargs="+", type=int, default=[0, 4, 8])
    p.add_argument("--trial_seeds", nargs="+", type=int, default=[42],
                   help="one trial per seed; metrics report the mean")
    p.add_argument("--num_samples", type=int, default=None,
                   help="cap evaluated examples per benchmark")
    p.add_argument("--batch_size", type=int, default=8)  # surface parity
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32"])
    # benchmark switches + manifests
    p.add_argument("--eval_coco", action="store_true")
    p.add_argument("--coco_manifest", type=str, default=None)
    p.add_argument("--eval_vqa", action="store_true")
    p.add_argument("--vqa_manifest", type=str, default=None)
    p.add_argument("--eval_ok_vqa", action="store_true")
    p.add_argument("--ok_vqa_manifest", type=str, default=None)
    p.add_argument("--eval_imagenet", action="store_true")
    p.add_argument("--imagenet_manifest", type=str, default=None)
    p.add_argument("--imagenet_classes", type=str, default=None,
                   help="JSON list of class names (index = label)")
    return p


def _build_model_and_params(args, tokenizer):
    from unimp_tpu.models import UniMPModel, get_config
    from unimp_tpu.train.checkpoint import restore_params

    cfg = get_config(
        args.variant, dtype="float32" if args.precision == "fp32" else "bfloat16"
    )
    vocab = ((len(tokenizer) + 127) // 128) * 128
    cfg = cfg.replace(
        lm=dataclasses.replace(cfg.lm, vocab_size=vocab),
        vision=dataclasses.replace(cfg.vision, image_size=args.image_size),
    )
    model = UniMPModel(cfg)
    params = restore_params(args.checkpoint_dir, args.checkpoint_name)
    return model, params


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    from unimp_tpu.data.tokenizer import UniMPTokenizer
    from unimp_tpu.evals import benchmark_harness as bh

    tokenizer = UniMPTokenizer.load(args.tokenizer_path)
    model, params = _build_model_and_params(args, tokenizer)

    results: dict = {}
    if args.eval_coco:
        assert args.coco_manifest, "--coco_manifest required with --eval_coco"
        for shots in args.shots:
            scores = [
                bh.evaluate_captioning(
                    model, params, tokenizer, args.coco_manifest,
                    num_shots=shots, image_size=args.image_size,
                    limit=args.num_samples, seed=seed,
                )["cider"]
                for seed in args.trial_seeds
            ]
            results[f"coco_cider_shots_{shots}"] = sum(scores) / len(scores)
            print(f"coco shots={shots} cider={results[f'coco_cider_shots_{shots}']:.3f}")
    if args.eval_vqa:
        assert args.vqa_manifest, "--vqa_manifest required with --eval_vqa"
        for shots in args.shots:
            scores = [
                bh.evaluate_vqa(
                    model, params, tokenizer, args.vqa_manifest,
                    num_shots=shots, image_size=args.image_size,
                    limit=args.num_samples, seed=seed,
                )["vqa_accuracy"]
                for seed in args.trial_seeds
            ]
            results[f"vqa_accuracy_shots_{shots}"] = sum(scores) / len(scores)
            print(f"vqa shots={shots} acc={results[f'vqa_accuracy_shots_{shots}']:.3f}")
    if args.eval_ok_vqa:
        assert args.ok_vqa_manifest, (
            "--ok_vqa_manifest required with --eval_ok_vqa")
        for shots in args.shots:
            scores = [
                bh.evaluate_vqa(
                    model, params, tokenizer, args.ok_vqa_manifest,
                    num_shots=shots, image_size=args.image_size,
                    limit=args.num_samples, seed=seed, ok_vqa=True,
                )["vqa_accuracy"]
                for seed in args.trial_seeds
            ]
            results[f"ok_vqa_accuracy_shots_{shots}"] = sum(scores) / len(scores)
            print(f"ok_vqa shots={shots} "
                  f"acc={results[f'ok_vqa_accuracy_shots_{shots}']:.3f}")
    if args.eval_imagenet:
        assert args.imagenet_manifest and args.imagenet_classes, (
            "--imagenet_manifest and --imagenet_classes required")
        with open(args.imagenet_classes) as f:
            class_names = json.load(f)
        m = bh.evaluate_classification(
            model, params, tokenizer, args.imagenet_manifest, class_names,
            image_size=args.image_size, limit=args.num_samples,
        )
        results["imagenet_top1"] = m["top1"]
        print(f"imagenet top1={m['top1']:.3f}")

    if args.results_file:
        with open(args.results_file, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
