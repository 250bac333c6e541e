"""Offline zoo-checkpoint conversion: reference ``.pth.tar`` -> orbax.

Production TPU workflow: the evals load either a torch zoo checkpoint
directly (imports torch at call time) or a jepa_tpu orbax directory. On
hosts where importing torch next to an initialized TPU runtime is
undesirable (or, as in the dev tunnel environment, hangs), convert once on
any CPU node and point ``pretrain.checkpoint`` at the resulting
``<tag>-latest`` directory:

    python -m jepa_tpu.utils.port_cli zoo/vitl16.pth.tar out/ \
        --model vit_large --patch-size 16 --num-frames 16 --uniform-power

The converted checkpoint carries the encoder under BOTH ``target`` and
``params/encoder`` subtrees, so eval configs with either
``checkpoint_key: target_encoder`` or ``encoder`` restore it (mirrors the
reference's key scheme, evals/video_classification_frozen/eval.py:420-427).
"""

from __future__ import annotations

import argparse
import logging
import os

logger = logging.getLogger(__name__)


def convert(src: str, dst_folder: str, model: str, patch_size: int,
            num_frames: int, tubelet_size: int, img_size: int,
            uniform_power: bool, checkpoint_key: str, tag: str) -> str:
    from jepa_tpu.models.factory import vit_cfg
    from jepa_tpu.utils import checkpoint as ckpt_lib
    from jepa_tpu.utils.checkpoint_port import load_pretrained_encoder

    cfg = vit_cfg(
        model, img_size=img_size, patch_size=patch_size,
        num_frames=num_frames, tubelet_size=tubelet_size,
        uniform_power=uniform_power,
    )
    params, _consts = load_pretrained_encoder(src, cfg, checkpoint_key)
    state = {"target": params, "params": {"encoder": params}}
    ckpt_lib.save_checkpoint(dst_folder, tag, state, epoch=0)
    path = os.path.join(os.path.abspath(dst_folder), f"{tag}-latest")
    logger.info("wrote %s", path)
    return path


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("src", help="reference .pth.tar checkpoint")
    ap.add_argument("dst", help="output folder for the orbax checkpoint")
    ap.add_argument("--model", required=True,
                    help="factory name, e.g. vit_large / vit_huge")
    ap.add_argument("--patch-size", type=int, default=16)
    ap.add_argument("--num-frames", type=int, default=16)
    ap.add_argument("--tubelet-size", type=int, default=2)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--uniform-power", action="store_true")
    ap.add_argument("--checkpoint-key", default="target_encoder")
    ap.add_argument("--tag", default="ported")
    a = ap.parse_args(argv)
    path = convert(a.src, a.dst, a.model, a.patch_size, a.num_frames,
                   a.tubelet_size, a.img_size, a.uniform_power,
                   a.checkpoint_key, a.tag)
    print(path)


if __name__ == "__main__":
    main()
