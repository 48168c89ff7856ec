"""Vid-ODE external dataset layer: per-video npy corpora, per-dataset
transforms, short-video filtering, sampler integration, and end-to-end
VidODE training on a synthetic KTH-shaped corpus
(reference Vid-ODE/dataloader.py:225-394)."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpora")
    for ds in ("kth", "hurricane", "mgif"):
        subprocess.run(
            [sys.executable, str(REPO / "scripts/make_synthetic_corpus.py"),
             "--dataset", ds, "--out", str(root / ds),
             "--train_videos", "6", "--test_videos", "3"],
            check=True, cwd=REPO)
    return root


def test_corpus_shapes_and_range(corpora):
    from ode_rl_tpu.data.video_corpus import VideoCorpus

    c = VideoCorpus(corpora / "kth", "kth", batch_size=2, clip_len=12,
                    resolution=64, seed=0)
    batch = next(c)
    assert batch.shape == (2, 12, 64, 64, 1)  # CenterCrop(120)→Scale(64)
    assert float(batch.min()) >= -0.5 - 1e-6
    assert float(batch.max()) <= 0.5 + 1e-6


def test_hurricane_six_channels(corpora):
    from ode_rl_tpu.data.video_corpus import VideoCorpus

    c = VideoCorpus(corpora / "hurricane", "hurricane", batch_size=2,
                    clip_len=10, resolution=64, seed=0)
    batch = next(c)
    assert batch.shape == (2, 10, 64, 64, 6)
    # channels must not be copies of each other (real multi-field data)
    ch = np.asarray(batch)
    assert not np.allclose(ch[..., 0], ch[..., 3])


def test_short_video_filtering(corpora):
    """mgif videos vary in length; a long clip_len must drop short ones
    (reference remove_files_under_sample_size)."""
    from ode_rl_tpu.data.video_corpus import VideoCorpus

    all_c = VideoCorpus(corpora / "mgif", "mgif", batch_size=2, clip_len=12)
    long_c = VideoCorpus(corpora / "mgif", "mgif", batch_size=2, clip_len=55)
    assert len(long_c.files) < len(all_c.files)


def test_test_split_deterministic(corpora):
    from ode_rl_tpu.data.video_corpus import VideoCorpus

    mk = lambda: VideoCorpus(corpora / "kth", "kth", batch_size=2,
                             clip_len=8, is_train=False, resolution=64)
    b1, b2 = next(mk()), next(mk())
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))


def test_parse_datasets_dispatch(corpora):
    from ode_rl_tpu.core.config import Config
    from ode_rl_tpu.data.mmnist import parse_datasets

    cfg = Config({"dataset": "kth", "data_dir": str(corpora / "kth"),
                  "batch_size": 2, "phase": "train", "window_size": 10,
                  "train_seq": 10, "test_seq": 10, "resolution": 64,
                  "seed": 0})
    loaders = parse_datasets(cfg)
    batch = next(loaders["train_dataloader"])
    assert batch.shape == (2, 10, 64, 64, 1)
    assert loaders["n_train_batches"] >= 1
    assert loaders["frozen"] is True


def test_sampler_integration(corpora):
    """Corpus clips flow through the Vid-ODE samplers into the batch-dict
    protocol (split_and_subsample_batch semantics)."""
    import jax

    from ode_rl_tpu.data.samplers import sample, split_batch
    from ode_rl_tpu.data.video_corpus import VideoCorpus

    c = VideoCorpus(corpora / "kth", "kth", batch_size=2, clip_len=12,
                    resolution=64)
    video = next(c)
    frames, mask = sample(jax.random.key(0), video, sample_size=8,
                          window_size=12, irregular=True, extrap=True,
                          train=True)
    batch = split_batch(frames, mask, extrap=True)
    assert batch["observed_data"].shape[1] == frames.shape[1] // 2
    assert batch["observed_mask"].shape[:2] == frames.shape[:2][:1] + (
        frames.shape[1] // 2,)


@pytest.mark.slow
def test_kth_vidode_trains_end_to_end(corpora, tmp_path):
    """`--configs defaults train_kth_vidode` on a synthetic KTH corpus:
    the VERDICT item-4 done criterion, via the real train loop."""
    from ode_rl_tpu.core.config import load_config
    from ode_rl_tpu.train.loop import train

    cfg = load_config(["defaults", "train_kth_vidode"],
                      config_path=REPO / "configs.yaml")
    cfg = cfg.replace(
        data_dir=str(corpora / "kth"), logdir=str(tmp_path),
        epochs=1, steps_per_epoch=2, batch_size=2, quiet=True,
        window_size=8, train_seq=8, train_in_seq=4, train_out_seq=4,
        n_layers=1, ode_max_steps=16, decode_diff_method="euler",
        loss_log_freq=1, ckpt_save_freq=100)
    result = train(cfg)
    assert result["final_step"] == 2
    assert np.isfinite(result["loss"])


@pytest.mark.slow
def test_frozen_train_auto_resumes(corpora, tmp_path):
    """Auto-resume on the frozen-data (non-fused) path: rerunning the
    same config continues from the saved step. Regression for a local
    jnp import in the fused branch shadowing the module import and
    crashing the non-fused resume (UnboundLocalError)."""
    from ode_rl_tpu.core.config import load_config
    from ode_rl_tpu.train.loop import train

    cfg = load_config(["defaults", "train_kth_vidode"],
                      config_path=REPO / "configs.yaml")
    cfg = cfg.replace(
        data_dir=str(corpora / "kth"), logdir=str(tmp_path),
        epochs=1, steps_per_epoch=2, batch_size=2, quiet=True,
        window_size=8, train_seq=8, train_in_seq=4, train_out_seq=4,
        n_layers=1, ode_max_steps=16, decode_diff_method="euler",
        loss_log_freq=1, ckpt_save_freq=2)
    assert train(cfg)["final_step"] == 2
    cfg2 = cfg.replace(epochs=2)
    result = train(cfg2)          # resumes at 2, trains to 4
    assert result["final_step"] == 4


def test_convert_mp4_to_npy_end_to_end(tmp_path):
    """mp4 ingestion exercised with a real codec round-trip (VERDICT
    round-2 missing #5): cv2-encode a tiny mp4, run the converter, and
    check the VideoCorpus-layout npy output. Skips only if no mp4 codec
    is available in the image."""
    cv2 = pytest.importorskip("cv2")
    import subprocess
    import sys

    src = tmp_path / "src"
    src.mkdir()
    for v in range(2):
        w = cv2.VideoWriter(str(src / f"vid{v}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
        for t in range(10):
            img = np.zeros((48, 48, 3), np.uint8)
            cv2.circle(img, (8 + 3 * t, 24), 6, (0, 255, 0), -1)
            w.write(img)
        w.release()
    probe = cv2.VideoCapture(str(src / "vid0.mp4"))
    ok, _ = probe.read()
    probe.release()
    if not ok:
        pytest.skip("no mp4 codec available for VideoCapture")

    out = tmp_path / "corpus"
    script = pathlib.Path(__file__).parents[1] / "scripts/convert_mp4_to_npy.py"
    res = subprocess.run(
        [sys.executable, str(script), "--src", str(src), "--out", str(out),
         "--gray", "--size", "64", "--split", "0.5"],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr
    train = np.load(out / "train" / "vid0.npy")
    test = np.load(out / "test" / "vid1.npy")
    assert train.shape == (10, 64, 64, 1) and train.dtype == np.uint8
    assert test.shape == (10, 64, 64, 1)
    assert train.max() > 0   # the moving circle actually rendered
