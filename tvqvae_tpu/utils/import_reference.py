"""Import reference-trained torch checkpoints into this framework.

Migration bridge for users of SynthAIr/T-VQ-VAE-TrajGen who already have
trained weights: converts the reference's on-disk formats

  - ``stage1.ckpt`` — Lightning checkpoint of trainers/stage1.py (encoder_l/
    encoder_h/decoder_l/decoder_h/vq_model_l/vq_model_h attributes)
  - ``fcn.ckpt``    — raw ``FCNBaseline.state_dict()`` (train_fcn.py:253-256)

into this repo's flax param trees / codebook states, purely from the
state-dict KEY STRUCTURE (no torch modules are instantiated, and the
reference package is not required — only the ``.ckpt`` file). The tensor
layout conversions (torch OIHW conv -> flax HWIO, ConvTranspose flip,
BN stat split, Linear transpose) are exactly the ones proven by the
weight-transplant parity tests (tests/test_reference_transplant*.py, output
agreement 2e-4); this module re-derives the block ordering from the
reference Sequential indices:

  encoder stack (vq_vae.py:155-167): EncBlock / ResBlock sequence — an
  index with ``block.0/1/2`` subkeys is an Enc/DecBlock (conv/convT, BN,
  Snake), ``convs.0..4`` (+optional ``proj``) is a ResBlock, and a bare
  ``weight`` is one of the two tail ConvTranspose2d layers
  (vq_vae.py:238-250).

Not importable from the reference:

  - stage2.ckpt — the prior transformer body is x-transformers
    (bidirectional_transformer.py:92-110); its parameter naming is an
    external-library implementation detail we cannot verify without the
    package installed. Retrain stage 2 here (minutes at the published
    budget with the precomputed-token path).
  - stage3.ckpt FE weights — the Unet1D mapping exists in test form
    (test_reference_transplant_fe_fcn.py) but stage 3 retrains in minutes,
    so the CLI does not expose it.
"""

from typing import Dict, Tuple

import numpy as np

__all__ = ["stage1_from_state_dict", "fcn_from_state_dict"]


# --- tensor layout conversions (proven in the transplant tests) -----------


def _np(t) -> np.ndarray:
    # works for torch tensors and numpy arrays alike
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv2d(sub: Dict[str, np.ndarray]) -> dict:
    # torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O)
    return {
        "kernel": _np(sub["weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sub["bias"]),
    }


def _conv1d(sub: Dict[str, np.ndarray]) -> dict:
    # torch Conv1d (O, I, k) -> flax (k, I, O)
    return {
        "kernel": _np(sub["weight"]).transpose(2, 1, 0),
        "bias": _np(sub["bias"]),
    }


def _convT2d(sub: Dict[str, np.ndarray]) -> dict:
    # torch ConvTranspose2d (I, O, kh, kw) -> our input-dilated-conv
    # formulation: spatially flipped kernel in (kh, kw, I, O)
    w = _np(sub["weight"])[:, :, ::-1, ::-1]
    return {
        "kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
        "bias": _np(sub["bias"]),
    }


def _bn(sub: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    return (
        {"scale": _np(sub["weight"]), "bias": _np(sub["bias"])},
        {"mean": _np(sub["running_mean"]), "var": _np(sub["running_var"])},
    )


def _snake(sub: Dict[str, np.ndarray]) -> dict:
    return {"a": _np(sub["a"]).reshape(-1)}


def _dense(sub: Dict[str, np.ndarray]) -> dict:
    return {"kernel": _np(sub["weight"]).T, "bias": _np(sub["bias"])}


# --- state-dict structure walking -----------------------------------------


def _subtree(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    p = prefix + "."
    return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}


def _children(sd: Dict[str, np.ndarray]):
    """Split '{i}.rest' keys into ordered [(i, {rest: tensor})]."""
    out: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        head, _, rest = k.partition(".")
        if head.isdigit():
            out.setdefault(int(head), {})[rest] = v
    return sorted(out.items())


def _res_block(sub: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """ResBlock (vq_vae.py:13-62): convs = Sequential(Snake, Conv, BN,
    Snake, Conv, Dropout); proj is a 1x1 Conv when channels change."""
    bn_p, bn_s = _bn(_subtree(sub, "convs.2"))
    params = {
        "Snake_0": _snake(_subtree(sub, "convs.0")),
        "Conv_0": _conv2d(_subtree(sub, "convs.1")),
        "BatchNorm_0": bn_p,
        "Snake_1": _snake(_subtree(sub, "convs.3")),
        "Conv_1": _conv2d(_subtree(sub, "convs.4")),
    }
    if "proj.weight" in sub:
        params["Conv_2"] = _conv2d(_subtree(sub, "proj"))
    return params, {"BatchNorm_0": bn_s}


def _enc_dec_block(sub: Dict[str, np.ndarray], transposed: bool):
    """VQVAEEncBlock / VQVAEDecBlock: block = Sequential(conv|convT, BN,
    Snake) (vq_vae.py:65-121)."""
    conv = (_convT2d if transposed else _conv2d)(_subtree(sub, "block.0"))
    bn_p, bn_s = _bn(_subtree(sub, "block.1"))
    params = {
        ("ConvTranspose2dTorch_0" if transposed else "Conv_0"): conv,
        "BatchNorm_0": bn_p,
        "Snake_0": _snake(_subtree(sub, "block.2")),
    }
    return params, {"BatchNorm_0": bn_s}


def _convert_stack(stack_sd: Dict[str, np.ndarray], decoder: bool):
    """Ordered reference Sequential -> flax auto-named {params, stats}."""
    params: dict = {}
    stats: dict = {}
    counters = {"EncBlock2d": 0, "DecBlock2d": 0, "ResBlock2d": 0,
                "ConvTranspose2dTorch": 0}

    def put(kind, p, s):
        name = f"{kind}_{counters[kind]}"
        counters[kind] += 1
        params[name] = p
        if s:
            stats[name] = s

    for idx, sub in _children(stack_sd):
        if "block.0.weight" in sub:
            kind = "DecBlock2d" if decoder else "EncBlock2d"
            put(kind, *_enc_dec_block(sub, transposed=decoder))
        elif "convs.0.a" in sub:
            put("ResBlock2d", *_res_block(sub))
        elif "weight" in sub and "bias" in sub and len(sub) == 2:
            if not decoder:
                raise ValueError(
                    f"bare conv at encoder index {idx} — unexpected layout"
                )
            put("ConvTranspose2dTorch", _convT2d(sub), None)
        else:
            raise ValueError(
                f"unrecognized block at index {idx}: keys {sorted(sub)}"
            )
    return params, stats


def _codebook(sub: Dict[str, np.ndarray]) -> dict:
    """vq_model_*. -> CodebookState dict (runner.codebook_to_dict layout).
    Reference EuclideanCodebook buffers: initted (1,), cluster_size (K,),
    embed_avg (K, D), embed (K, D) (vq.py:157-165)."""
    for bad in ("project_in.weight", "project_out.weight"):
        if any(k.endswith(bad) for k in sub):
            raise ValueError(
                "VectorQuantize with project_in/out (codebook_dim != dim) "
                "is not used by the reference config and is not supported"
            )
    cb = _subtree(sub, "_codebook")
    return {
        "embed": _np(cb["embed"]),
        "embed_avg": _np(cb["embed_avg"]),
        "cluster_size": _np(cb["cluster_size"]),
        "initted": np.asarray(bool(_np(cb["initted"]).reshape(-1)[0])),
    }


# --- public entry points ---------------------------------------------------


def stage1_from_state_dict(sd: Dict[str, np.ndarray]):
    """Reference stage1.ckpt state_dict -> (params, batch_stats, vq_l,
    vq_h, inferred) matching this repo's Stage1Model tree (models/stage1.py)
    and runner checkpoint layout. `inferred` carries geometry read off the
    weights (input_length from the TimeHead Linear, in_channels from the
    first conv) for meta/validation."""
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]  # Lightning checkpoint wrapper

    params: dict = {}
    stats: dict = {}
    for band in ("l", "h"):
        enc_p, enc_s = _convert_stack(
            _subtree(sd, f"encoder_{band}.encoder"), decoder=False
        )
        dec_p, dec_s = _convert_stack(
            _subtree(sd, f"decoder_{band}.decoder"), decoder=True
        )
        params[f"encoder_{band}"] = enc_p
        params[f"decoder_{band}"] = dec_p
        params[f"head_{band}"] = {
            "Dense_0": _dense(_subtree(sd, f"decoder_{band}.linear"))
        }
        stats[f"encoder_{band}"] = enc_s
        stats[f"decoder_{band}"] = dec_s

    vq_l = _codebook(_subtree(sd, "vq_model_l"))
    vq_h = _codebook(_subtree(sd, "vq_model_h"))

    first_conv = params["encoder_l"]["EncBlock2d_0"]["Conv_0"]["kernel"]
    head = params["head_l"]["Dense_0"]["kernel"]
    inferred = {
        "in_channels": int(first_conv.shape[2]) // 2,  # spectral 2C -> C
        "input_length": int(head.shape[0]),
        "init_dim": int(first_conv.shape[3]),
        "hid_dim": int(vq_l["embed"].shape[1]),
        "codebook_sizes": {"lf": int(vq_l["embed"].shape[0]),
                           "hf": int(vq_h["embed"].shape[0])},
    }
    return params, stats, vq_l, vq_h, inferred


def fcn_from_state_dict(sd: Dict[str, np.ndarray]):
    """Reference fcn.ckpt (raw FCNBaseline state_dict, fcn.py:65-101) ->
    (variables, inferred) for this repo's FCN (models/fcn.py)."""
    if "state_dict" in sd and not hasattr(sd["state_dict"], "shape"):
        sd = sd["state_dict"]
    params: dict = {}
    stats: dict = {}
    blocks = _children(_subtree(sd, "layers"))
    if len(blocks) != 3:
        raise ValueError(f"expected 3 FCN conv blocks, got {len(blocks)}")
    for i, sub in blocks:
        conv = _subtree(sub, "layers.0")
        bn = _subtree(sub, "layers.1")
        params[f"Conv_{i}"] = _conv1d(conv)
        bn_p, bn_s = _bn(bn)
        params[f"BatchNorm_{i}"] = bn_p
        stats[f"BatchNorm_{i}"] = bn_s
    params["Dense_0"] = _dense(_subtree(sd, "final"))
    variables = {"params": params, "batch_stats": stats}
    inferred = {
        "in_channels": int(params["Conv_0"]["kernel"].shape[1]),
        "n_classes": int(params["Dense_0"]["kernel"].shape[1]),
    }
    return variables, inferred
