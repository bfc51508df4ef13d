"""Experiment entry point (reference main.py:7-23):
load config → run every mission → evaluate → save.

Usage:
  python main.py [--config PATH] [--batch B] [--max-steps T] [--results DIR]
Config path defaults to $CONFIG_FILE_PATH or the packaged example.
"""

import argparse
import logging
import os
import sys

from ipp_rl_tpu import load_config
from ipp_rl_tpu.experiments import Experiment
from ipp_rl_tpu.utils import Notifier, setup_logger

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    # .env tier first: file values fill in unset process env vars
    # (reference constants.py:7-23 + compose env_file semantics)
    from ipp_rl_tpu.config.env import load_dotenv, log_env_variables

    load_dotenv(os.path.join(os.path.dirname(__file__), ".env"))

    ap = argparse.ArgumentParser()
    default_cfg = os.environ.get(
        "CONFIG_FILE_PATH",
        os.path.join(os.path.dirname(__file__), "ipp_rl_tpu/config/example.yaml"),
    )
    ap.add_argument("--config", default=default_cfg)
    ap.add_argument("--batch", type=int, default=None, help="mission batch (default: repetitions)")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--results", default=os.environ.get("RESULTS_DIR", "results"))
    ap.add_argument("--checkpoints", default=os.environ.get("CHECKPOINTS_DIR", "checkpoints"))
    ap.add_argument("--logs", default=os.environ.get("LOG_DIR", "logs"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    setup_logger(args.logs)
    log_env_variables(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(args.config)
    notifier = Notifier(cfg.title, out_dir=args.logs)
    notifier.started({"config": args.config})
    try:
        exp = Experiment(
            cfg,
            results_dir=args.results,
            checkpoints_dir=args.checkpoints,
            seed=args.seed,
        )
        exp.run(batch_size=args.batch, max_steps=args.max_steps)
        kpis = exp.evaluate()
        out = exp.save()
        notifier.finished({"results": out, "kpis": kpis})
        logger.info("results written to %s", out)
        return 0
    except Exception as e:
        notifier.failed(str(e))
        raise


if __name__ == "__main__":
    sys.exit(main())
