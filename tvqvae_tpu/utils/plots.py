"""Plotting utilities (host-side matplotlib).

Reference: timevqvae/utils/plot_utils.py (trajectory/cluster/altitude plots)
and the inline validation plots in trainers/sampler (stage1.py:138-167,
stage2.py:121-140, stage3.py:264-360, sampler.py:370-481). Cartopy/Basemap
map backgrounds are optional in this environment; all plots degrade to plain
lat/lon axes when the geo stack is unavailable.
"""

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_reconstruction(x_l, xhat_l, x_h, xhat_h, b: int, c: int, step: int):
    """Stage-1 validation plot (reference stage1.py:138-167)."""
    fig, axes = plt.subplots(3, 1, figsize=(4, 6))
    fig.suptitle(f"step-{step} | channel {c} (blue: GT, orange: recon)")
    pairs = [
        (x_l[b, c], xhat_l[b, c], r"$x_l$ (LF)"),
        (x_h[b, c], xhat_h[b, c], r"$x_h$ (HF)"),
        (x_l[b, c] + x_h[b, c], xhat_l[b, c] + xhat_h[b, c], r"$x$ (LF+HF)"),
    ]
    for ax, (gt, rec, title) in zip(axes, pairs):
        ax.plot(np.asarray(gt), alpha=0.7)
        ax.plot(np.asarray(rec), alpha=0.7)
        ax.set_title(title)
        ax.set_ylim(-4, 4)
    fig.tight_layout()
    return fig


def plot_generated(x_l, x_h, x, b: int, c: int, step: int, title=""):
    """Stage-2 sampling plot (reference stage2.py:121-140)."""
    fig, axes = plt.subplots(3, 1, figsize=(4, 6))
    fig.suptitle(f"step-{step} | channel {c} {title}")
    for ax, (arr, t) in zip(
        axes,
        [(x_l, r"$\hat{x}_l$"), (x_h, r"$\hat{x}_h$"), (x, r"$\hat{x}$")],
    ):
        ax.plot(np.asarray(arr)[b, c])
        ax.set_title(t)
        ax.set_ylim(-4, 4)
    fig.tight_layout()
    return fig


def plot_visual_inspection(
    X_real, X_gen, n: int = 30, title: str = "visual inspection"
):
    """Overlay grids of real vs generated series per channel
    (reference sampler.py:370-411)."""
    C = X_real.shape[1]
    fig, axes = plt.subplots(2, C, figsize=(3 * C, 5), squeeze=False)
    fig.suptitle(title)
    for c in range(C):
        for row, data, name in [(0, X_real, "real"), (1, X_gen, "generated")]:
            ax = axes[row][c]
            for i in range(min(n, data.shape[0])):
                ax.plot(np.asarray(data)[i, c], alpha=0.2, color="C0")
            ax.set_title(f"{name} ch{c}")
    fig.tight_layout()
    return fig


def plot_pca(z_sets: Sequence[np.ndarray], labels: Sequence[str],
             n: int = 1024, title: str = "PCA"):
    """PCA scatter; fits on the first set, projects the rest
    (reference sampler.py:413-435, stage3.py:348-360)."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=2, random_state=0)
    fig = plt.figure(figsize=(4, 4))
    plt.title(title)
    for i, (z, label) in enumerate(zip(z_sets, labels)):
        idx = np.random.RandomState(0).choice(
            z.shape[0], size=min(n, z.shape[0]), replace=True
        )
        emb = pca.fit_transform(z[idx]) if i == 0 else pca.transform(z[idx])
        plt.scatter(emb[:, 0], emb[:, 1], alpha=0.1, label=label)
    plt.legend(loc="upper right")
    plt.tight_layout()
    return fig


def plot_tsne(z_sets, labels, n: int = 512, title: str = "t-SNE"):
    """Joint t-SNE embedding (reference sampler.py:437-481)."""
    from sklearn.manifold import TSNE

    rng = np.random.RandomState(0)
    subs, tags = [], []
    for z, label in zip(z_sets, labels):
        idx = rng.choice(z.shape[0], size=min(n, z.shape[0]), replace=True)
        subs.append(z[idx])
        tags.extend([label] * len(idx))
    emb = TSNE(
        n_components=2, random_state=0, init="random",
        perplexity=min(30, max(2, len(tags) // 4)),
    ).fit_transform(np.concatenate(subs))
    fig = plt.figure(figsize=(4, 4))
    plt.title(title)
    start = 0
    for z, label in zip(subs, labels):
        e = emb[start:start + len(z)]
        plt.scatter(e[:, 0], e[:, 1], alpha=0.1, label=label)
        start += len(z)
    plt.legend(loc="upper right")
    plt.tight_layout()
    return fig


def _cartopy():
    """Optional geo stack: (cartopy, ccrs) or (None, None).

    Map backgrounds (reference plot_utils.py:63-100,158-230,306-384) light up
    automatically when cartopy is installed (`pip install .[geo]`); without it
    every geo plot degrades to plain lat/lon axes.
    """
    try:
        import cartopy
        import cartopy.crs as ccrs

        return cartopy, ccrs
    except ImportError:
        return None, None


def geographic_extent(
    X: np.ndarray, lat_idx: int = 0, lon_idx: int = 1, margin: float = 0.5
):
    """[lon_min, lon_max, lat_min, lat_max] with a margin, from (B, C, L)
    trajectories (reference plot_utils.py:24-43 extract_geographic_info)."""
    lats = np.asarray(X)[:, lat_idx, :]
    lons = np.asarray(X)[:, lon_idx, :]
    return [
        float(lons.min() - margin), float(lons.max() + margin),
        float(lats.min() - margin), float(lats.max() + margin),
    ]


def _class_colors(n: int):
    """husl-like categorical palette (reference uses seaborn husl,
    plot_utils.py:114)."""
    try:
        import seaborn as sns

        return sns.color_palette("husl", max(n, 1))
    except ImportError:
        return [f"C{i % 10}" for i in range(max(n, 1))]


def _map_axes(fig_or_none, nrows=1, ncols=1, figsize=(5, 5)):
    """(fig, axes, is_map): GeoAxes grid under cartopy, plain axes without."""
    cartopy, ccrs = _cartopy()
    if cartopy is not None:
        fig, axes = plt.subplots(
            nrows, ncols, figsize=figsize,
            subplot_kw={"projection": ccrs.EuroPP()}, squeeze=False,
        )
        return fig, axes, True
    fig, axes = plt.subplots(nrows, ncols, figsize=figsize, squeeze=False)
    return fig, axes, False


def _decorate_map(ax, extent=None, airports: Optional[dict] = None):
    """Coastlines/borders/gridlines + airport markers on a GeoAxes
    (reference plot_utils.py:74-95)."""
    cartopy, ccrs = _cartopy()
    pc = ccrs.PlateCarree()
    ax.coastlines()
    import cartopy.feature as cfeature

    ax.add_feature(cfeature.BORDERS, linestyle=":", alpha=1.0)
    if extent is not None:
        ax.set_extent(extent, crs=pc)
    for (name, (lat, lon)), color, tag in zip(
        (airports or {}).items(), ["red", "green"], ["Origin", "Destination"]
    ):
        ax.scatter([lon], [lat], color=color, s=300, zorder=5,
                   label=f"{tag}: {name}", transform=pc)
    gl = ax.gridlines(draw_labels=True, color="gray", alpha=0.5,
                      linestyle="--")
    gl.top_labels = False
    gl.right_labels = False


def plot_trajectories(
    X: np.ndarray,
    lat_idx: int = 0,
    lon_idx: int = 1,
    labels: Optional[np.ndarray] = None,
    title: str = "trajectories",
    max_n: int = 200,
    airports: Optional[dict] = None,
):
    """Lat/lon trajectory plot, cluster-colored when labels given, with an
    EuroPP map background + airport markers when cartopy is available
    (reference plot_utils.py:63-146); plain axes otherwise.

    airports: {ICAO: (lat, lon)} — first entry drawn as origin (red), second
    as destination (green), like the reference's ADEP/ADES markers.
    """
    fig, axes, is_map = _map_axes(None, figsize=(6, 6))
    ax = axes[0][0]
    ax.set_title(title)
    n = min(max_n, X.shape[0])
    kw = {}
    if is_map:
        _, ccrs = _cartopy()
        kw["transform"] = ccrs.PlateCarree()
    if labels is None:
        for i in range(n):
            ax.plot(X[i, lon_idx], X[i, lat_idx], alpha=0.2,
                    color="darkblue", linewidth=1, **kw)
    else:
        colors = _class_colors(int(np.max(labels)) + 1)
        for i in range(n):
            ax.plot(X[i, lon_idx], X[i, lat_idx], alpha=0.3,
                    color=colors[int(labels[i])], linewidth=1, **kw)
    if is_map:
        _decorate_map(ax, geographic_extent(X[:n], lat_idx, lon_idx),
                      airports)
        if airports:
            ax.legend(loc="upper right")
    else:
        ax.set_xlabel("longitude")
        ax.set_ylabel("latitude")
    fig.tight_layout()
    return fig


def plot_clustering(
    X: np.ndarray,
    labels: np.ndarray,
    lat_idx: int = 0,
    lon_idx: int = 1,
    title: str = "trajectories per class",
    max_n_per_class: int = 200,
    airports: Optional[dict] = None,
):
    """One map panel per cluster, husl-colored (reference
    plot_utils.py:158-230 plot_clustering); plain axes without cartopy."""
    labels = np.asarray(labels).reshape(-1)
    n_clusters = int(labels.max()) + 1
    colors = _class_colors(n_clusters)
    fig, axes, is_map = _map_axes(
        None, 1, n_clusters, figsize=(5 * n_clusters, 6)
    )
    kw = {}
    if is_map:
        _, ccrs = _cartopy()
        kw["transform"] = ccrs.PlateCarree()
    extent = geographic_extent(X, lat_idx, lon_idx)
    for c in range(n_clusters):
        ax = axes[0][c]
        idx = np.nonzero(labels == c)[0][:max_n_per_class]
        for i in idx:
            ax.plot(X[i, lon_idx], X[i, lat_idx], alpha=0.2,
                    color=colors[c], linewidth=1, **kw)
        if is_map:
            _decorate_map(ax, extent, airports)
        else:
            ax.set_xlabel("longitude")
            ax.set_ylabel("latitude")
        ax.set_title(f"Class {c}")
    fig.suptitle(title, fontsize=16)
    fig.tight_layout()
    return fig


def plot_altitude(X: np.ndarray, alt_idx: int = 2, title: str = "altitude",
                  max_n: int = 200):
    """Altitude profiles over time (plain axes; for the reference's
    map-scatter variant see plot_altitude_map, plot_utils.py:306-384)."""
    fig = plt.figure(figsize=(5, 3))
    plt.title(title)
    for i in range(min(max_n, X.shape[0])):
        plt.plot(X[i, alt_idx], alpha=0.2, color="C0")
    plt.xlabel("timestep")
    plt.ylabel("altitude")
    plt.tight_layout()
    return fig


def plot_altitude_map(
    X: np.ndarray,
    lat_idx: int = 0,
    lon_idx: int = 1,
    alt_idx: int = 2,
    title: str = "altitude",
    max_n: int = 50,
    stride: int = 8,
):
    """Trajectories on a map with altitude as color/size (reference
    plot_utils.py:306-384 plot_altitude, Basemap merc -> cartopy Mercator).
    Without cartopy: the same scatter on plain lat/lon axes."""
    cartopy, ccrs = _cartopy()
    n = min(max_n, X.shape[0])
    lats = np.asarray(X)[:n, lat_idx, ::stride].ravel()
    lons = np.asarray(X)[:n, lon_idx, ::stride].ravel()
    alts = np.asarray(X)[:n, alt_idx, ::stride].ravel()

    if cartopy is not None:
        fig, ax = plt.subplots(
            figsize=(9, 8), subplot_kw={"projection": ccrs.Mercator()}
        )
        pc = ccrs.PlateCarree()
        import cartopy.feature as cfeature

        ax.coastlines(resolution="50m")
        ax.add_feature(cfeature.LAND, color="lightgray")
        ax.add_feature(cfeature.OCEAN, color="azure")
        ax.add_feature(cfeature.BORDERS, linestyle=":")
        ax.set_extent(geographic_extent(X[:n], lat_idx, lon_idx), crs=pc)
        kw = {"transform": pc}
    else:
        fig, ax = plt.subplots(figsize=(9, 8))
        ax.set_xlabel("longitude")
        ax.set_ylabel("latitude")
        kw = {}
    for i in range(n):
        ax.plot(X[i, lon_idx], X[i, lat_idx], color="black", alpha=0.2,
                zorder=1, **kw)
    sc = ax.scatter(lons, lats, c=alts, cmap="viridis",
                    s=10 + 40 * (alts - alts.min()) /
                    max(alts.max() - alts.min(), 1e-9),
                    zorder=2, **kw)
    fig.colorbar(sc, ax=ax, aspect=30, label="Altitude (feet)")
    ax.set_title(title)
    fig.tight_layout()
    return fig


def plot_timeseries_ci(X_real, X_gen, feature_names=None,
                       title: str = "time series (mean ± 95% CI)"):
    """Per-channel mean with 95% bands, real vs generated (the reference's
    time_series.ipynb / .figures/timeseries_ci_EHAM_LIMC.png)."""
    C = X_real.shape[1]
    fig, axes = plt.subplots(1, C, figsize=(3.2 * C, 3), squeeze=False)
    for c in range(C):
        ax = axes[0][c]
        for data, color, label in [(X_real, "C0", "real"),
                                   (X_gen, "C1", "generated")]:
            arr = np.asarray(data)[:, c, :]
            mu = arr.mean(axis=0)
            lo = np.percentile(arr, 2.5, axis=0)
            hi = np.percentile(arr, 97.5, axis=0)
            ax.plot(mu, color=color, label=label)
            ax.fill_between(np.arange(len(mu)), lo, hi, color=color, alpha=0.2)
        name = feature_names[c] if feature_names else f"ch{c}"
        ax.set_title(name)
        if c == 0:
            ax.legend()
    fig.suptitle(title)
    fig.tight_layout()
    return fig


def plot_distributions(X_real, X_gen, feature_names=None, bins: int = 80,
                       title: str = "marginal distributions"):
    """Per-channel marginal histograms, real vs generated (the reference's
    distribution_plots.ipynb)."""
    C = X_real.shape[1]
    fig, axes = plt.subplots(1, C, figsize=(3.2 * C, 3), squeeze=False)
    for c in range(C):
        ax = axes[0][c]
        r = np.asarray(X_real)[:, c, :].ravel()
        g = np.asarray(X_gen)[:, c, :].ravel()
        lo, hi = min(r.min(), g.min()), max(r.max(), g.max())
        ax.hist(r, bins=bins, range=(lo, hi), density=True, alpha=0.5,
                label="real")
        ax.hist(g, bins=bins, range=(lo, hi), density=True, alpha=0.5,
                label="generated")
        name = feature_names[c] if feature_names else f"ch{c}"
        ax.set_title(name)
        if c == 0:
            ax.legend()
    fig.suptitle(title)
    fig.tight_layout()
    return fig


def plot_metric_correlation_heatmap(results: dict, keys, title: str):
    """Correlation heatmap between per-flight distance metrics (the
    reference's correlation_heatmaps.ipynb /
    .figures/correlation_heatmap_{euclidean,spherical}.png)."""
    mat = np.stack([np.asarray(results[k], float) for k in keys])
    corr = np.corrcoef(mat)
    fig, ax = plt.subplots(figsize=(1.1 * len(keys) + 2, 1.0 * len(keys) + 1))
    im = ax.imshow(corr, vmin=-1, vmax=1, cmap="coolwarm")
    ax.set_xticks(range(len(keys)))
    ax.set_yticks(range(len(keys)))
    ax.set_xticklabels(keys, rotation=45, ha="right", fontsize=8)
    ax.set_yticklabels(keys, fontsize=8)
    for i in range(len(keys)):
        for j in range(len(keys)):
            ax.text(j, i, f"{corr[i, j]:.2f}", ha="center", va="center",
                    fontsize=7)
    fig.colorbar(im, ax=ax, shrink=0.8)
    ax.set_title(title)
    fig.tight_layout()
    return fig


def plot_metric_percentiles(results: dict, keys, title: str):
    """Percentile curves per distance metric (the reference's
    .figures/percentile_plots_{euclidean,spherical}.png)."""
    ncol = 4
    nrow = (len(keys) + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 2.6 * nrow),
                             squeeze=False)
    qs = np.linspace(0, 100, 101)
    for ax, k in zip(np.ravel(axes), keys):
        vals = np.asarray(results[k], float)
        ax.plot(qs, np.percentile(vals, qs))
        ax.set_title(k, fontsize=9)
        ax.set_xlabel("percentile")
    for ax in np.ravel(axes)[len(keys):]:
        ax.axis("off")
    fig.suptitle(title)
    fig.tight_layout()
    return fig
