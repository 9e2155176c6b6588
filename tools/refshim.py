"""Import shim for running the reference (/root/reference) on CPU.

The reference is a torch/Lightning codebase; this environment has torch but
not lightning/mlflow/numba/x-transformers. This module installs minimal fake
modules so the reference's *own numeric code* (models, eval_utils,
stat_metrics, rocket_functions, trainers.Stage1) imports and runs — used by
tools/measure_reference.py (perf baseline) and tests/test_reference_parity.py
(differential parity). Nothing here is product code.

The stubs only satisfy imports; no reference logic is altered:
- lightning.LightningModule -> torch.nn.Module with no-op `log`, a
  `lr_schedulers()` accessor, and a `global_step` attribute (the three
  Lightning touchpoints in trainers/stage1.py:179-197).
- mlflow -> no-op log_artifact/log_metric (utils/train_utils.py:33-41).
- numba.njit/prange -> identity decorator / range, so
  evaluation/rocket_functions.py:21-127 runs as pure Python (slow, exact).
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _fake_lightning():
    import torch.nn as nn

    mod = types.ModuleType("lightning")

    class LightningModule(nn.Module):
        def __init__(self):
            super().__init__()
            self.global_step = 0
            self._shim_scheduler = None

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

        def save_hyperparameters(self, *a, **k):
            pass

        def lr_schedulers(self):
            return self._shim_scheduler

        @classmethod
        def load_from_checkpoint(cls, path, map_location=None, **kwargs):
            """Lightning touchpoint #4 (reference maskgit.py:53-59,
            trainers/stage3.py:43-56): construct with the caller's kwargs
            and restore the checkpoint's state_dict. Checkpoints written by
            tools/showdown.py use the same {"state_dict": ...} layout
            Lightning's Trainer.save_checkpoint produces."""
            import torch

            obj = cls(**kwargs)
            ckpt = torch.load(path, map_location=map_location or "cpu",
                              weights_only=False)
            state = ckpt.get("state_dict", ckpt)
            obj.load_state_dict(state)
            return obj

    mod.LightningModule = LightningModule
    return mod


def _fake_mlflow():
    mod = types.ModuleType("mlflow")
    for name in (
        "log_artifact", "log_metric", "log_metrics", "log_param",
        "log_params", "set_tracking_uri", "set_experiment", "start_run",
        "end_run",
    ):
        setattr(mod, name, lambda *a, **k: None)
    return mod


def _fake_numba():
    mod = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(f):
            return f

        return deco

    mod.njit = njit
    mod.jit = njit
    mod.prange = range
    return mod


def _fake_geo_stack():
    """traffic / cartopy / basemap / altair — imported at module scope by
    reference utils (plot_utils.py:6-14, data_utils.py:11) but not touched by
    the numeric paths we exercise. Attribute access raises on use."""
    mods = {}

    def _pkg(name, **attrs):
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodule imports resolve
        for k, v in attrs.items():
            setattr(mod, k, v)
        mods[name] = mod
        return mod

    _placeholder = type("StubPlaceholder", (), {})

    traffic = _pkg("traffic")
    traffic.core = _pkg("traffic.core", Traffic=type("Traffic", (), {}))
    traffic.data = _pkg("traffic.data", airports=None)

    cartopy = _pkg("cartopy")
    cartopy.crs = _pkg(
        "cartopy.crs",
        EuroPP=type("EuroPP", (), {}),
        PlateCarree=type("PlateCarree", (), {}),
    )
    cartopy.feature = _pkg("cartopy.feature", BORDERS=None, COASTLINE=None)

    _pkg("mpl_toolkits.basemap", Basemap=type("Basemap", (), {}))
    _pkg("altair", Chart=_placeholder)
    # x_transformers: FUNCTIONAL torch shim (tools/xtshim.py) so the
    # reference's stage-2/3 prior can actually train (the cross-framework
    # showdown); placeholder fallback if the shim cannot import.
    try:
        import xtshim

        mods["x_transformers"] = xtshim.make_module()
    except Exception:
        _pkg(
            "x_transformers",
            ContinuousTransformerWrapper=type(
                "ContinuousTransformerWrapper", (), {}
            ),
            Encoder=type("Encoder", (), {}),
        )
    return mods


def install():
    """Install fake modules and put the reference on sys.path.

    Returns the list of sys.modules names actually stubbed so callers
    (e.g. the parity-test fixture) can remove them afterwards — the stubs
    must not leak into other code that feature-gates on these imports.
    """
    installed = []
    for name, maker in (
        ("lightning", _fake_lightning),
        ("mlflow", _fake_mlflow),
        ("numba", _fake_numba),
    ):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = maker()
                installed.append(name)
    for name, mod in _fake_geo_stack().items():
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = mod
                installed.append(name)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return installed


def uninstall(installed):
    """Remove previously installed stubs (and the cached reference modules
    that captured them)."""
    for name in installed:
        sys.modules.pop(name, None)
    for name in [n for n in sys.modules if n.split(".")[0] == "timevqvae"]:
        sys.modules.pop(name, None)
    if REFERENCE_ROOT in sys.path:
        sys.path.remove(REFERENCE_ROOT)


def reference_available():
    import os

    return os.path.isdir(REFERENCE_ROOT)
