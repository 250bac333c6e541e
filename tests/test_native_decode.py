"""Native FFmpeg decoder: frame accuracy, random access, dataset integration."""

import os

import numpy as np
import pytest

videodec = pytest.importorskip("jepa_tpu.native.videodec")


@pytest.fixture(scope="module")
def fixture_videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    paths = []
    for i in range(3):
        p = str(d / f"vid{i}.mp4")
        videodec.write_test_video(p, num_frames=80, width=192, height=128, seed=i)
        paths.append(p)
    return paths


def test_probe_and_batch(fixture_videos):
    r = videodec.VideoReader(fixture_videos[0])
    assert len(r) == 80
    assert r.width == 192 and r.height == 128
    batch = r.get_batch([0, 10, 20])
    assert batch.shape == (3, 128, 192, 3) and batch.dtype == np.uint8
    r.close()


def test_frame_index_accuracy(fixture_videos):
    """Random-access frame t must be byte-identical to frame t of a full
    sequential decode (seek correctness; decode is deterministic)."""
    seq = videodec.VideoReader(fixture_videos[0]).get_batch(list(range(80)))
    r = videodec.VideoReader(fixture_videos[0])
    for t in [0, 7, 23, 24, 25, 60, 79]:
        frame = r.get_batch([t])[0]
        np.testing.assert_array_equal(frame, seq[t], err_msg=f"frame {t}")
    # analytic spot check in a clip-safe (low luma) region
    ys, xs = np.mgrid[5:20, 5:40]
    t = 7
    g = seq[t][ys, xs, 1].astype(np.float64)
    t_hat = np.median((g - ys) / 3.0)
    assert abs(t_hat - t) < 1.0, f"content drifted: {t_hat} vs {t}"
    r.close()


def test_unsorted_and_duplicate_indices(fixture_videos):
    r = videodec.VideoReader(fixture_videos[1])
    a = r.get_batch([30, 5, 30, 60])
    b5 = r.get_batch([5])[0]
    b30 = r.get_batch([30])[0]
    np.testing.assert_array_equal(a[1], b5)
    np.testing.assert_array_equal(a[0], b30)
    np.testing.assert_array_equal(a[2], b30)
    r.close()


def test_out_of_range_pads_with_last(fixture_videos):
    r = videodec.VideoReader(fixture_videos[0])
    batch = r.get_batch([78, 79, 200])
    np.testing.assert_array_equal(batch[2], batch[1])
    r.close()


def test_resized_decode(fixture_videos):
    r = videodec.VideoReader(fixture_videos[0])
    small = r.get_batch([0, 1], out_size=(64, 96))
    assert small.shape == (2, 64, 96, 3)
    r.close()


def test_dataset_pipeline_with_native_backend(fixture_videos, tmp_path):
    from jepa_tpu.data.loader import make_video_loader

    manifest = tmp_path / "train.csv"
    manifest.write_text("".join(f"{p} {i}\n" for i, p in enumerate(fixture_videos)))
    ds, loader, sampler = make_video_loader(
        data_paths=[str(manifest)],
        batch_size=2,
        frames_per_clip=8,
        frame_step=2,
        num_clips=2,
        decode_backend="native",
        num_workers=2,
        seed=0,
    )
    sampler.set_epoch(0)
    batch = next(iter(loader))
    assert batch["clips"].shape == (4, 8, 128, 192, 3)  # nc*B clip-major
    assert batch["clips"].dtype == np.uint8
    assert batch["labels"].shape == (2,)
    assert batch["clips"].std() > 10  # real decoded content, not zeros


def test_corrupt_video_resample(fixture_videos, tmp_path):
    from jepa_tpu.data.video_dataset import VideoDataset

    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"\x00" * 4096)  # big enough to pass the size filter
    manifest = tmp_path / "m.csv"
    manifest.write_text(f"{bad} 0\n{fixture_videos[0]} 1\n")
    ds = VideoDataset(
        data_paths=[str(manifest)], frames_per_clip=4, frame_step=2,
        num_clips=1, decode_backend="native", seed=0,
    )
    with pytest.warns(UserWarning):
        clips, label, _, _ = ds[0]  # corrupt -> resamples to the good video
    assert clips.shape == (1, 4, 128, 192, 3)
    assert label == 1


def test_native_decode_aspect_preserving(tmp_path):
    """16:9 source -> short side == requested, letterboxed, content intact."""
    from jepa_tpu.native.videodec import NativeBackend, write_test_video

    p = str(tmp_path / "wide.mp4")
    write_test_video(p, num_frames=12, width=320, height=180, seed=3)
    be = NativeBackend(short_side=96, canvas=(192, 192))
    frames, (hp, wp) = be.decode_aspect(p, np.arange(0, 12, 3))
    assert frames.shape == (4, 192, 192, 3)
    assert (hp, wp) == (96, 171)  # aspect 16:9 preserved
    assert frames[:, :hp, :wp].std() > 10  # real content
    assert frames[:, hp:].sum() == 0 and frames[:, :, wp:].sum() == 0
