"""Direct video(mp4) ingestion (VERDICT round-3 missing #3).

The reference's frozen mode reads ``video_<n>.mp4`` via cv2 with a
bounded read-retry loop (reference dataloader.py:105-147). These tests
prove the framework's equivalents end-to-end on tiny in-image corpora:

  * scripts/make_mp4_mmnist.py → FrozenMovingMNIST (direct mp4 decode,
    window sampling, [-0.5, 0.5] batch convention);
  * the parse_datasets dispatcher engages frozen mode for an mp4 corpus
    with no meta.json;
  * scripts/convert_mp4_to_npy.py → the VideoCorpus per-video npy layout
    (the Vid-ODE external-dataset bridge).
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def mp4_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("mp4_mmnist")
    subprocess.run(
        [sys.executable, str(ROOT / "scripts/make_mp4_mmnist.py"),
         "--out", str(out), "--videos", "4", "--test_videos", "2",
         "--frames", "12"],
        check=True, capture_output=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    return out


def test_frozen_loader_reads_mp4_directly(mp4_corpus):
    from ode_rl_tpu.data.frozen import FrozenMovingMNIST

    loader = FrozenMovingMNIST(mp4_corpus, batch_size=3, n_frames_input=4,
                               n_frames_output=4, is_train=True)
    batch = next(iter(loader))
    assert batch.shape == (3, 8, 64, 64, 1)
    arr = np.asarray(batch)
    assert arr.min() >= -0.5 - 1e-6 and arr.max() <= 0.5 + 1e-6
    # mp4 encoding is lossy but digits must survive: frames are not blank
    # and not saturated.
    assert 0.001 < float((arr > 0.0).mean()) < 0.6


def test_parse_datasets_dispatches_mp4_frozen(mp4_corpus):
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.data.mmnist import parse_datasets

    cfg = Config({"dataset": "mmnist", "frozen": True,
                  "data_dir": str(mp4_corpus), "batch_size": 2,
                  "train_in_seq": 4, "train_out_seq": 4,
                  "test_in_seq": 4, "test_out_seq": 4, "phase": "train",
                  "num_digits": 3, "resolution": 64})
    loaders = parse_datasets(cfg)
    batch = next(loaders["train_dataloader"])
    assert batch.shape == (2, 8, 64, 64, 1)
    test_batch = next(loaders["test_dataloader"])
    assert test_batch.shape == (2, 8, 64, 64, 1)


def test_read_video_retry_budget(tmp_path):
    from ode_rl_tpu.data.frozen import read_video_file

    bad = tmp_path / "video_0.mp4"
    bad.write_bytes(b"not a video at all")
    with pytest.raises(IOError):
        read_video_file(bad, retries=2)


def test_convert_mp4_to_npy_bridge(mp4_corpus, tmp_path):
    out = tmp_path / "corpus"
    subprocess.run(
        [sys.executable, str(ROOT / "scripts/convert_mp4_to_npy.py"),
         "--src", str(mp4_corpus / "train"), "--out", str(out),
         "--gray", "--size", "64"],
        check=True, capture_output=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    npys = sorted(out.rglob("*.npy"))
    assert npys, f"converter produced no npy files under {out}"
    v = np.load(npys[0])
    assert v.ndim == 4 and v.shape[1:3] == (64, 64)
