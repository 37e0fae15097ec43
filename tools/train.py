"""CLI trainer: `python tools/train.py config/default.yml [--resume]`.

Same shape as the reference entry point (reference tools/train.py:73-81: argparse with
one positional YAML config), plus `--resume` (new capability; the reference has no
resume path, SURVEY.md section 5).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssd_object_detection_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from ssd_object_detection_tpu.config import load_config
from ssd_object_detection_tpu.train.loop import Trainer


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="train ssd model")
    parser.add_argument("config", type=str, help="yaml config file")
    parser.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    parser.add_argument("--run-dir", type=str, default=None, help="override the timestamped run dir")
    parser.add_argument("--eval-after", action="store_true",
                        help="compute COCO-style mAP on the validation split after training")
    parser.add_argument("--eval-max-batches", type=int, default=None)
    args = parser.parse_args()

    config = load_config(args.config)
    if args.resume:
        config.model.checkpoint.resume = True
    trainer = Trainer(config, run_dir=args.run_dir)
    state = trainer.train()
    logging.getLogger(__name__).info("done at step %d; artifacts in %s", int(state.step), trainer.run_dir)
    if args.eval_after:
        import json

        metrics = trainer.evaluate(
            state.params, max_batches=args.eval_max_batches, step=int(state.step)
        )
        print(json.dumps(metrics))


if __name__ == "__main__":
    main()
