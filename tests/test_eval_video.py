"""video_classification_frozen eval app: end-to-end smoke on native-decoded
fixture videos with a tiny random encoder; mechanics + learnability."""

import os

import numpy as np
import pytest

videodec = pytest.importorskip("jepa_tpu.native.videodec")


@pytest.fixture(scope="module")
def class_videos(tmp_path_factory):
    """Two visually distinct classes (different generator seeds)."""
    d = tmp_path_factory.mktemp("clsvids")
    train_rows, val_rows = [], []
    for cls in range(2):
        for i in range(6):
            p = str(d / f"c{cls}_v{i}.mp4")
            videodec.write_test_video(p, num_frames=48, width=96, height=96, seed=cls * 100)
            (train_rows if i < 4 else val_rows).append(f"{p} {cls}")
    train_csv = d / "train.csv"
    val_csv = d / "val.csv"
    train_csv.write_text("\n".join(train_rows) + "\n")
    val_csv.write_text("\n".join(val_rows) + "\n")
    return str(train_csv), str(val_csv)


def _eval_cfg(train_csv, val_csv, folder, ckpt, attend=True):
    return {
        "eval_name": "video_classification_frozen",
        "resume_checkpoint": False,
        "pretrain": {
            "model_name": "vit_tiny",
            "checkpoint_key": "target_encoder",
            "folder": folder,
            "checkpoint": ckpt,  # absolute path wins the os.path.join
            "write_tag": "probe",
            "patch_size": 16,
            "tubelet_size": 2,
            "frames_per_clip": 4,
            "frame_step": 2,
            "uniform_power": True,
        },
        "data": {
            "dataset_train": train_csv,
            "dataset_val": val_csv,
            "num_classes": 2,
            "frames_per_clip": 4,
            "num_segments": 2,
            "num_views_per_segment": 2,
            "decode_backend": "native",
            "num_workers": 2,
            # the fixture classes are color-separable; RandAugment's
            # invert/solarize would scramble them (flaky learnability)
            "auto_augment": False,
        },
        "optimization": {
            "resolution": 32,
            # PER-DEVICE (reference: per-GPU): 8 virtual devices -> loader
            # batch 8 = the whole 8-video train split per iteration
            "batch_size": 1,
            "attend_across_segments": attend,
            "num_epochs": 3,
            "weight_decay": 0.01,
            "lr": 0.005,
            "start_lr": 0.001,
            "final_lr": 0.0005,
            "warmup": 0.5,
            "use_bfloat16": False,
        },
    }


def test_eval_video_end_to_end(class_videos, tmp_path, tiny_pretrain_ckpt):
    from jepa_tpu.evals.scaffold import main as eval_main

    train_csv, val_csv = class_videos
    cfg = _eval_cfg(train_csv, val_csv, str(tmp_path), tiny_pretrain_ckpt, attend=True)
    val_accs = eval_main("video_classification_frozen", args_eval=cfg)
    assert len(val_accs) == 3
    # artifacts: probe csv + checkpoint under <folder>/video_classification_frozen/
    sub = tmp_path / "video_classification_frozen"
    assert (sub / "probe_r0.csv").exists()
    assert (sub / "probe-latest").exists()
    # classes differ by a huge constant color offset -> even a random tiny
    # encoder + linear probe should separate them quickly
    assert val_accs[-1] >= 75.0, f"probe failed to learn: {val_accs}"


def test_eval_video_per_segment_mode(class_videos, tmp_path, tiny_pretrain_ckpt):
    from jepa_tpu.evals.scaffold import main as eval_main

    train_csv, val_csv = class_videos
    cfg = _eval_cfg(train_csv, val_csv, str(tmp_path), tiny_pretrain_ckpt, attend=False)
    cfg["optimization"]["num_epochs"] = 1
    val_accs = eval_main("video_classification_frozen", args_eval=cfg)
    assert len(val_accs) == 1 and np.isfinite(val_accs[0])


def test_eval_video_use_pos_embed_opt_in(class_videos, tmp_path, tiny_pretrain_ckpt):
    """optimization.use_pos_embed wires the 1D temporal pos-embed + true
    clip_indices through both jitted programs (reference ClipAggregation
    opt-in, utils.py:106-119)."""
    from jepa_tpu.evals.scaffold import main as eval_main

    train_csv, val_csv = class_videos
    cfg = _eval_cfg(train_csv, val_csv, str(tmp_path), tiny_pretrain_ckpt, attend=True)
    cfg["optimization"]["num_epochs"] = 1
    cfg["optimization"]["use_pos_embed"] = True
    val_accs = eval_main("video_classification_frozen", args_eval=cfg)
    assert len(val_accs) == 1 and np.isfinite(val_accs[0])


def test_clip_aggregation_temporal_pos_embed_rows():
    """The opt-in adds table[clip_indices[::tubelet]] repeated over spatial
    tokens — checked against a by-hand composition."""
    import jax
    import jax.numpy as jnp

    from jepa_tpu.evals.aggregation import clip_aggregation, temporal_pos_embed_table
    from jepa_tpu.models.factory import vit_cfg
    from jepa_tpu.models.vit import init_vit

    cfg = vit_cfg("vit_tiny", img_size=32, patch_size=16, num_frames=4,
                  tubelet_size=2, compute_dtype=jnp.float32)
    params, consts = init_vit(jax.random.PRNGKey(0), cfg)
    clips = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 1, 4, 32, 32, 3))
    table = temporal_pos_embed_table(cfg.embed_dim, tubelet_size=2)
    ci = jnp.asarray([[[0, 1, 2, 3], [10, 11, 12, 13]]])  # [B=1, S=2, T=4]

    base = clip_aggregation(params, consts, clips, cfg,
                            attend_across_segments=True)[0]
    out = clip_aggregation(params, consts, clips, cfg,
                           attend_across_segments=True,
                           pos_embed_table=table, clip_indices=ci)[0]
    n_spatial = (32 // 16) ** 2
    pe = np.repeat(np.asarray(table)[[0, 2, 10, 12]], n_spatial, axis=0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(base[0]) + pe,
                               atol=1e-5, rtol=1e-5)


def test_frame_aggregation_temporal_pos_embed_uses_raw_frame_rows():
    """FrameAggregation indexes the table with RAW frame indices over a
    full max_frames-row table (reference utils.py:43-47, no tubelet
    division — unlike ClipAggregation's max_frames//tubelet table,
    utils.py:106-112). A half-size table would silently clamp indices
    >= max_frames//2."""
    import jax
    import jax.numpy as jnp

    from jepa_tpu.evals.aggregation import frame_aggregation, temporal_pos_embed_table
    from jepa_tpu.models.factory import vit_cfg
    from jepa_tpu.models.vit import init_vit

    cfg = vit_cfg("vit_tiny", img_size=32, patch_size=16, num_frames=1,
                  tubelet_size=2, compute_dtype=jnp.float32)
    params, consts = init_vit(jax.random.PRNGKey(0), cfg)
    clips = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, 2, 32, 32, 3))
    max_frames = 16
    table = temporal_pos_embed_table(cfg.embed_dim, max_frames=max_frames,
                                     tubelet_size=1)
    assert table.shape[0] == max_frames  # frame path: no tubelet division
    # raw frame indices BEYOND max_frames//2 must hit their true rows
    ci = jnp.asarray([[[9, 15]]])  # [B=1, S=1, T=2]
    base = frame_aggregation(params, consts, clips, cfg)[0]
    out = frame_aggregation(params, consts, clips, cfg,
                            pos_embed_table=table, clip_indices=ci)[0]
    n = base.shape[1] // 2
    pe = np.repeat(np.asarray(table)[[9, 15]], n, axis=0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(base[0]) + pe,
                               atol=1e-5, rtol=1e-5)
