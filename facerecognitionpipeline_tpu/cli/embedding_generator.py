"""embedding_generator CLI: produce the eval corpus for one or all models.

Reference flag surface (`embedding_generator.py:435-498`): --model_type
{adaface,arcface,all}, --architecture {ir_50,ir_101,all}, --dataset_root,
--output_root.
"""

from __future__ import annotations

import argparse

from facerecognitionpipeline_tpu.models.irse import BACKBONE_CONFIGS


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Generate face embeddings for evaluation using multiple models"
    )
    p.add_argument("--model_type", type=str, default="all",
                   choices=["adaface", "arcface", "all"])
    p.add_argument("--architecture", type=str, default="all",
                   choices=sorted(BACKBONE_CONFIGS) + ["all"])
    p.add_argument("--dataset_root", type=str, default="dataset")
    p.add_argument("--output_root", type=str, default="output/v0")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from facerecognitionpipeline_tpu.pipeline.corpus import EmbeddingGenerator

    model_types = (
        ["adaface", "arcface"] if args.model_type == "all" else [args.model_type]
    )
    architectures = (
        ["ir_50", "ir_101"] if args.architecture == "all" else [args.architecture]
    )

    for model_type in model_types:
        for arch in architectures:
            gen = EmbeddingGenerator(
                model_type=model_type,
                architecture=arch,
                dataset_root=args.dataset_root,
                output_root=args.output_root,
            )
            gen.generate_all_embeddings()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
