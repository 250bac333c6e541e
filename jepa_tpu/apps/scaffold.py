"""App dispatch: config key `app: <name>` -> jepa_tpu.apps.<name>.train.main
(reference: app/scaffold.py:16-21). The extension point for new workloads."""

from __future__ import annotations

import importlib
import logging

logger = logging.getLogger(__name__)


def main(app: str, args: dict, resume_preempt: bool = False):
    logger.info("running pretraining of app: %s", app)
    mod = importlib.import_module(f"jepa_tpu.apps.{app}.train")
    return mod.main(args=args, resume_preempt=resume_preempt)
