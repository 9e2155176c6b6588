"""Plot smoke tests: every figure builder renders on synthetic data.

The geo plots (trajectories / clustering / altitude map) are cartopy-gated
(reference plot_utils.py:63-100,158-230,306-384): with cartopy installed they
draw EuroPP/Mercator map backgrounds; without it (this environment) they must
still render on plain axes.
"""

import numpy as np

from tvqvae_tpu.data import make_synthetic_trajectories
from tvqvae_tpu.utils import plots


def _data():
    X, y = make_synthetic_trajectories(n=24, channels=4, length=64)
    # shift "lat"/"lon" into plausible degree ranges
    X = X.copy()
    X[:, 0] = 48.0 + X[:, 0]
    X[:, 1] = 6.0 + 2.0 * X[:, 1]
    X[:, 2] = 10000.0 * (X[:, 2] + 1.5)
    return X, y


def test_geographic_extent():
    X, _ = _data()
    ext = plots.geographic_extent(X, 0, 1, margin=0.5)
    assert ext[0] < ext[1] and ext[2] < ext[3]
    assert ext[2] <= X[:, 0].min() and ext[3] >= X[:, 0].max()


def test_trajectory_plots_render():
    import matplotlib.pyplot as plt

    X, y = _data()
    figs = [
        plots.plot_trajectories(X, 0, 1, title="t"),
        plots.plot_trajectories(
            X, 0, 1, labels=y, airports={"EHAM": (52.3, 4.8),
                                         "LIMC": (45.6, 8.7)},
        ),
        plots.plot_clustering(X, y, 0, 1),
        plots.plot_altitude(X, 2),
        plots.plot_altitude_map(X, 0, 1, 2),
    ]
    for f in figs:
        assert f is not None
        plt.close(f)


def test_map_backgrounds_gated_on_cartopy():
    # in this environment cartopy is absent -> plain axes; with cartopy the
    # same calls must produce GeoAxes (checked by attribute presence)
    cartopy, ccrs = plots._cartopy()
    X, y = _data()
    fig = plots.plot_trajectories(X, 0, 1)
    ax = fig.axes[0]
    if cartopy is None:
        assert not hasattr(ax, "coastlines")
    else:
        assert hasattr(ax, "coastlines")
    import matplotlib.pyplot as plt

    plt.close(fig)
