"""L3DAS23 backend + SELD utility tests."""

import numpy as np

from eabnet_tpu.config import DataConfig
from eabnet_tpu.data.datasets import make_dataset
from eabnet_tpu.data.l3das import (
    SELD_CLASSES,
    csv_to_matrix_task2,
    gen_fake_l3das_dataset,
    gen_seld_out,
    gen_submission_list_task2,
    segment_waveforms,
    spectrum_fast,
)


def test_fake_l3das_roundtrip(tmp_path):
    gen_fake_l3das_dataset(str(tmp_path), n_items=3, channels=4, n=8000)
    cfg = DataConfig(
        dataset="l3das23",
        training_predictors_path=str(tmp_path / "training_predictors.pkl"),
        training_target_path=str(tmp_path / "training_target.pkl"),
        validation_predictors_path=str(
            tmp_path / "validation_predictors.pkl"
        ),
        validation_target_path=str(tmp_path / "validation_target.pkl"),
    )
    train, val = make_dataset(cfg)
    assert len(train) == 3 and len(val) == 3
    audio, target = train[0]
    assert audio.shape == (4, 8000)
    assert target.shape == (1, 8000)


def test_spectrum_fast_shapes():
    x = np.random.default_rng(0).standard_normal((1, 16000))
    out = spectrum_fast(x, nperseg=512, noverlap=128)
    # 2 channels (mag+phase), DC cut, last frame cut
    assert out.shape[0] == 2
    assert out.shape[1] == 256


def test_seld_submission_and_csv_roundtrip(tmp_path):
    num_classes, max_overlaps, frames = 14, 3, 20
    rng = np.random.default_rng(1)
    sed = np.zeros((frames, num_classes * max_overlaps))
    doa = rng.random((frames, num_classes * max_overlaps * 3)) * 0.5
    sed[3, 5 * max_overlaps] = 1.0  # one event: class 5, frame 3
    rows = gen_submission_list_task2(sed, doa, num_frames=frames)
    assert rows.shape == (1, 5)
    assert rows[0][0] == 3 and rows[0][1] == 5

    # csv -> matrix
    csv = tmp_path / "labels.csv"
    csv.write_text(
        "Start,End,Class,rho,theta,z\n"
        f"0.0,0.3,{SELD_CLASSES[2]},10,45,1\n"
    )
    class_dict = {c: i for i, c in enumerate(SELD_CLASSES)}
    mat = csv_to_matrix_task2(str(csv), class_dict, dur=2.0, step=0.1)
    assert mat.shape == (20, 14 * 3 + 14 * 3 * 3)
    # class 2 active in the first frames
    assert mat[0, 2 * 3] == 1.0
    assert mat[10, 2 * 3] == 0.0


def test_segment_waveforms():
    x = np.arange(20, dtype=float).reshape(1, 20)
    y = x * 2
    xs, ys = segment_waveforms(x, y, 8)
    assert len(xs) == 3
    assert xs[0].shape == (1, 8)
    assert xs[2][0, -4:].sum() == 0  # zero-padded tail
    np.testing.assert_array_equal(ys[0], xs[0] * 2)


def test_gen_seld_out_shape():
    rows = gen_seld_out(10, rng=np.random.default_rng(2))
    if len(rows):
        assert rows.shape[1] == 5
