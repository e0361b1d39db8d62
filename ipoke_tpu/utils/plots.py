"""Statistical plot family for test-mode artifacts: per-frame errorbar
lines grouped by poke count, twin-axis mean/std-vs-pokes summaries, and
violin distributions (reference ``utils/logging.py:979-1160`` —
``make_errorbar_plot`` / ``make_nn_var_plot`` / ``make_two_axes_plot`` /
``make_violin_plot``; note the reference's violin plot is an empty ``pass``
stub — here it is real).

All functions take a plain ``dict`` of equal-length columns or a pandas
``DataFrame`` and write a figure file; matplotlib runs on the Agg backend so
the family is safe headless.
"""

from typing import Dict, Optional, Sequence, Union

import numpy as np

Frame = Union[Dict[str, Sequence], "pandas.DataFrame"]  # noqa: F821


def _as_df(data: Frame):
    import pandas as pd

    return data if isinstance(data, pd.DataFrame) \
        else pd.DataFrame.from_dict(data)


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    try:  # the reference styles with seaborn (utils/logging.py:984)
        import seaborn as sns

        sns.set_theme()
    except ImportError:  # pragma: no cover
        pass
    return plt


def _palette(n: int):
    try:
        import seaborn as sns

        return sns.color_palette(n_colors=n)
    except ImportError:  # pragma: no cover
        import matplotlib.pyplot as plt

        cmap = plt.get_cmap("tab10")
        return [cmap(i % 10) for i in range(n)]


def make_errorbar_plot(fname: str, data: Frame, xid: str = "frame_id",
                       yid: str = "nn_mse_err",
                       hueid: str = "poke_indicator",
                       varid: Optional[str] = None, alpha: float = 0.3,
                       title: Optional[str] = None) -> None:
    """Per-``xid`` metric lines, one per ``hueid`` group, with a +-var/2
    band when ``varid`` names a variance column (reference
    ``make_errorbar_plot``, utils/logging.py:979-1010)."""
    df = _as_df(data)
    plt = _plt()
    fig, ax = plt.subplots()
    groups = list(dict.fromkeys(df[hueid]))
    for g, color in zip(groups, _palette(len(groups))):
        sub = df[df[hueid] == g].groupby(xid, as_index=False).mean(
            numeric_only=True)
        x = sub[xid].to_numpy()
        y = sub[yid].to_numpy()
        label = g if isinstance(g, str) else f"{g} Pokes"
        ax.plot(x, y, marker="d", color=color, label=label)
        if varid is not None and varid in sub:
            v = sub[varid].to_numpy()
            ax.fill_between(x, y - 0.5 * v, y + 0.5 * v, alpha=alpha,
                            color=color)
    ax.legend(loc="upper left")
    ax.set_xlim(left=float(np.min(df[xid])), right=float(np.max(df[xid])))
    ax.set_xlabel(xid)
    ax.set_ylabel(yid)
    if title is not None:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)


def make_nn_var_plot(n_pokes: int, nn_per_frame: np.ndarray, savedir: str,
                     std_per_frame: Optional[np.ndarray] = None,
                     save_csv: bool = True) -> str:
    """Per-frame nearest-neighbour MSE artifact set: csv + errorbar pdf
    (reference ``make_nn_var_plot``, utils/logging.py:1013-1030)."""
    import os

    os.makedirs(savedir, exist_ok=True)
    nn_per_frame = np.asarray(nn_per_frame)
    data = {
        "frame_id": np.arange(nn_per_frame.shape[0]),
        "nn_mse_err": nn_per_frame,
        "poke_indicator": [f"{n_pokes} poke vectors"] * nn_per_frame.shape[0],
    }
    if std_per_frame is not None:
        std_per_frame = np.asarray(std_per_frame)
        assert std_per_frame.shape[0] == nn_per_frame.shape[0]
        data["std_per_frame"] = std_per_frame
    df = _as_df(data)
    if save_csv:
        df.to_csv(os.path.join(savedir,
                               f"keypoint_err_data_{n_pokes}_pokes.csv"))
    fig_name = os.path.join(savedir, f"keypoint_err_{n_pokes}_pokes.pdf")
    make_errorbar_plot(
        fig_name, df,
        varid="std_per_frame" if std_per_frame is not None else None)
    return fig_name


def make_two_axes_plot(data: Frame, savepath: str, key_y1: str = "Mean MSE",
                       key_y2: str = "Std", x: str = "Number of Pokes",
                       title: str = "") -> None:
    """Twin-axis summary: mean metric (left axis) and its std (right axis)
    against the poke count (reference ``make_two_axes_plot``,
    utils/logging.py:1052-1105)."""
    df = _as_df(data).groupby(x, as_index=False).mean(numeric_only=True)
    plt = _plt()
    colors = _palette(4)
    xs = df[x].to_numpy().astype(int)
    y1 = df[f"{key_y1} per Frame"].to_numpy()
    y2 = df[f"{key_y2} per Frame"].to_numpy()
    fig, ax1 = plt.subplots()
    l1 = ax1.plot(xs, y1, "d--", color=colors[0], label=key_y1,
                  markersize=10)
    ax1.tick_params(axis="y", colors=colors[0])
    ax1.ticklabel_format(axis="y", style="sci", scilimits=(-2, 2))
    ax2 = ax1.twinx()
    l2 = ax2.plot(xs, y2, "H:", color=colors[3], label=key_y2, markersize=10)
    ax2.grid(False)
    ax2.tick_params(axis="y", colors=colors[3])
    ax2.ticklabel_format(axis="y", style="sci", scilimits=(-2, 2))
    ax1.set_xticks(xs)
    ax1.set_xlabel(x)
    if title:
        ax1.set_title(title)
    lns = l1 + l2
    ax1.legend(lns, [ln.get_label() for ln in lns], loc="lower left")
    fig.tight_layout()
    fig.savefig(savepath)
    plt.close(fig)


def make_violin_plot(fname: str, data: Frame, xid: str = "Method",
                     yid: str = "Mean Squared KP Error",
                     order: Optional[Sequence[str]] = None,
                     zscore_cut: float = 3.0,
                     title: Optional[str] = None) -> None:
    """Per-group violin distributions with the group means overlaid, after
    a |z| < ``zscore_cut`` outlier filter — the reference only sketches this
    in its offline ``__main__`` analysis (utils/logging.py:1143-1160) and
    stubs ``make_violin_plot`` itself as ``pass`` (:1107-1108)."""
    df = _as_df(data)
    y = df[yid].to_numpy(dtype=np.float64)
    std = y.std() or 1.0
    keep = np.abs((y - y.mean()) / std) < zscore_cut
    df = df[keep]
    groups = order if order is not None else list(dict.fromkeys(df[xid]))
    series = [df[df[xid] == g][yid].to_numpy(dtype=np.float64)
              for g in groups]
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 4))
    present = [(i, s) for i, s in enumerate(series) if s.size > 1]
    if present:
        ax.violinplot([s for _, s in present],
                      positions=[i for i, _ in present], showextrema=False)
    ax.scatter(range(len(groups)),
               [s.mean() if s.size else np.nan for s in series], c="k",
               zorder=3, label="mean")
    ax.set_xticks(range(len(groups)))
    ax.set_xticklabels([str(g) for g in groups])
    ax.set_ylabel(yid)
    if title is not None:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)
