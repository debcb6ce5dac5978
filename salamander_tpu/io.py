"""Model checkpointing: save/load any fitted model to a single .npz file.

The reference has no persistence at all (SURVEY.md section 5.4): model state
lives in AnnData/MuData containers that are never written, and refitting
always restarts from scratch. Here the complete model state - hyperparameters,
count containers, learned parameters, history - round-trips through one flat
npz archive, so fits can be checkpointed, resumed on another host, or handed
to the analysis/plotting layer without refitting.

Orbax is intentionally not required: the state is a handful of small arrays,
and npz keeps checkpoints dependency-free and portable.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from . import containers

_HYPERPARAM_KEYS = {
    "KLNMF": ["n_signatures", "init_method", "min_iterations", "max_iterations",
              "conv_test_freq", "tol", "dtype"],
    "ARDNMF": ["n_signatures", "prior", "a", "b", "init_method",
               "min_iterations", "max_iterations", "conv_test_freq", "tol",
               "dtype"],
    "MvNMF": ["n_signatures", "init_method", "lam", "delta", "min_iterations",
              "max_iterations", "conv_test_freq", "tol", "dtype"],
    "CorrNMFDet": ["n_signatures", "init_method", "dim_embeddings",
                   "min_iterations", "max_iterations", "conv_test_freq", "tol",
                   "dtype", "newton_cg_compat"],
    "MultimodalCorrNMF": ["ns_signatures", "dim_embeddings", "init_method",
                          "min_iterations", "max_iterations", "conv_test_freq",
                          "tol", "dtype", "newton_cg_compat"],
}

_EXTRA_STATE = {
    "KLNMF": [],
    "ARDNMF": ["b_resolved_"],
    "MvNMF": ["_gamma"],
    "CorrNMFDet": ["variance"],
    "MultimodalCorrNMF": ["variance"],
}


def _pack_adata(payload: dict, prefix: str, adata) -> None:
    payload[f"{prefix}/X"] = np.asarray(adata.X)
    payload[f"{prefix}/obs_names"] = np.asarray(adata.obs_names).astype(str)
    payload[f"{prefix}/var_names"] = np.asarray(adata.var_names).astype(str)
    for col in adata.obs.columns:
        values = np.asarray(adata.obs[col])
        if values.dtype == object:
            values = values.astype(str)
        payload[f"{prefix}/obs:{col}"] = values
    for key, value in adata.obsm.items():
        payload[f"{prefix}/obsm:{key}"] = value
    for key, value in adata.obsp.items():
        payload[f"{prefix}/obsp:{key}"] = value


def _unpack_adata(archive, prefix: str):
    adata = containers.AnnData(archive[f"{prefix}/X"])
    adata.obs_names = archive[f"{prefix}/obs_names"]
    adata.var_names = archive[f"{prefix}/var_names"]
    lead = f"{prefix}/"
    for key in archive.files:
        if not key.startswith(lead):
            continue
        rest = key[len(lead):]
        if rest.startswith("obs:"):
            adata.obs[rest[4:]] = archive[key]
        elif rest.startswith("obsm:"):
            adata.obsm[rest[5:]] = archive[key]
        elif rest.startswith("obsp:"):
            adata.obsp[rest[5:]] = archive[key]
    return adata


def save_model(model, path: str) -> None:
    """Serialize a (fitted) model of any family to a .npz checkpoint."""
    class_name = type(model).__name__
    if class_name not in _HYPERPARAM_KEYS:
        raise TypeError(f"Cannot checkpoint models of type {class_name}.")

    meta: dict[str, Any] = {
        "class": class_name,
        "format_version": 1,
        "hyperparameters": {
            key: getattr(model, key) for key in _HYPERPARAM_KEYS[class_name]
        },
        "extra_state": {
            key: float(getattr(model, key)) for key in _EXTRA_STATE[class_name]
        },
        "history_keys": sorted(model.history),
    }
    payload: dict[str, np.ndarray] = {
        "meta": np.asarray(json.dumps(meta)),
    }
    for key, values in model.history.items():
        payload[f"history/{key}"] = np.asarray(values)

    # KLNMF's fitted per-sample loss weights are model state too
    for weights_attr in ("weights_kl", "weights_lhalf"):
        weights = getattr(model, weights_attr, None)
        if weights is not None:
            payload[f"weights/{weights_attr}"] = np.asarray(weights)

    if class_name == "MultimodalCorrNMF":
        meta["mod_names"] = model.mod_names
        payload["meta"] = np.asarray(json.dumps(meta))
        for name in model.mod_names:
            _pack_adata(payload, f"mod/{name}", model.mdata[name])
            _pack_adata(payload, f"sigs/{name}", model.asignatures[name])
        payload["mdata/obs_names"] = np.asarray(model.mdata.obs_names).astype(str)
        for key, value in model.mdata.obsm.items():
            payload[f"mdata/obsm:{key}"] = value
    else:
        _pack_adata(payload, "adata", model.adata)
        _pack_adata(payload, "sigs", model.asignatures)

    np.savez_compressed(path, **payload)


def load_model(path: str):
    """Restore a model checkpoint written by save_model."""
    from . import models

    with np.load(path, allow_pickle=False) as archive:
        meta = json.loads(str(archive["meta"]))
        model_cls = getattr(models, meta["class"])
        model = model_cls(**meta["hyperparameters"])
        for key, value in meta["extra_state"].items():
            setattr(model, key, value)
        for key in meta["history_keys"]:
            values = archive[f"history/{key}"]
            model.history[key] = (
                values.tolist() if values.ndim else values.item()
            )
        for key in archive.files:
            if key.startswith("weights/"):
                setattr(model, key[len("weights/"):], archive[key])

        if meta["class"] == "MultimodalCorrNMF":
            mods, sigs = {}, {}
            for name in meta["mod_names"]:
                mods[name] = _unpack_adata(archive, f"mod/{name}")
                sigs[name] = _unpack_adata(archive, f"sigs/{name}")
            model.mdata = containers.MuData(mods)
            model.mdata.obs_names = archive["mdata/obs_names"]
            for key in archive.files:
                if key.startswith("mdata/obsm:"):
                    model.mdata.obsm[key[len("mdata/obsm:"):]] = archive[key]
            model.asignatures = sigs
        else:
            model.adata = _unpack_adata(archive, "adata")
            model.asignatures = _unpack_adata(archive, "sigs")
    model._is_fitted = True
    return model
