"""Statistical plot family (reference utils/logging.py:979-1160)."""

import numpy as np


def test_errorbar_and_nn_var_plot(tmp_path):
    from ipoke_tpu.utils.plots import make_errorbar_plot, make_nn_var_plot

    rng = np.random.default_rng(0)
    T, reps = 8, 6
    data = {
        "Time": np.tile(np.arange(T), reps),
        "Mean MSE per Frame": rng.uniform(size=T * reps),
        "Std per Frame": rng.uniform(size=T * reps) * 0.1,
        "Number of Pokes": ([1] * (T * reps // 2)) + ([3] * (T * reps // 2)),
    }
    out = tmp_path / "errorbar.pdf"
    make_errorbar_plot(str(out), data, xid="Time", yid="Mean MSE per Frame",
                       hueid="Number of Pokes", varid="Std per Frame",
                       title="t")
    assert out.stat().st_size > 0

    fig = make_nn_var_plot(2, rng.uniform(size=T), str(tmp_path / "nn"),
                           std_per_frame=rng.uniform(size=T))
    import os

    assert os.path.getsize(fig) > 0
    assert (tmp_path / "nn" / "keypoint_err_data_2_pokes.csv").exists()


def test_two_axes_and_violin_plot(tmp_path):
    from ipoke_tpu.utils.plots import make_two_axes_plot, make_violin_plot

    rng = np.random.default_rng(1)
    n = 40
    data = {
        "Number of Pokes": rng.integers(1, 6, size=n),
        "Mean MSE per Frame": rng.uniform(size=n),
        "Std per Frame": rng.uniform(size=n) * 0.2,
    }
    out = tmp_path / "two_axes.pdf"
    make_two_axes_plot(data, str(out), title="iPER")
    assert out.stat().st_size > 0

    vdata = {
        "Method": ["a"] * 20 + ["b"] * 20 + ["ours"] * 20,
        "Mean Squared KP Error": np.concatenate([
            rng.normal(1.0, 0.1, 20), rng.normal(0.8, 0.1, 20),
            rng.normal(0.5, 0.1, 20)]),
    }
    vout = tmp_path / "violin.pdf"
    make_violin_plot(str(vout), vdata, order=["a", "b", "ours"])
    assert vout.stat().st_size > 0
