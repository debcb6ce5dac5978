"""Quickstart: extract mutational signatures from the PCAWG breast catalog.

Run from the repo root:  python examples/quickstart.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import salamander_tpu as sal
from salamander_tpu import datasets
from salamander_tpu.models import KLNMF

# 1. Load counts (192 samples x 96 SBS channels) into an annotated container.
adata = sal.AnnData(datasets.load_pcawg_sbs())

# 2. Fit 100 random restarts as ONE device program and keep the best.
model = KLNMF(n_signatures=5, init_method="random")
summary = sal.fit_best_of(model, adata, n_restarts=100, base_seed=0)
print(f"best KL divergence over {len(summary.losses)} restarts: "
      f"{summary.losses[summary.best_index]:,.1f} "
      f"(worst: {summary.losses.max():,.1f})")

# 3. Inspect: signatures / exposures are annotated dataframes.
print(model.signatures.round(3).iloc[:, :4])
print("total exposure per signature:",
      np.round(model.exposures.sum(axis=0).to_numpy()))

# 4. Match against the COSMIC catalog and plot.
catalog = datasets.load_cosmic_sbs_catalog()
model.plot_signatures(outfile="signatures.png")
sal.pl.barplot_pandas(model.signatures, catalog=catalog)

# 5. How stable are the signatures? Bootstrap-refit resampled cohorts as
#    one device program (each family refits under its own objective).
stability = sal.bootstrap_stability(model, n_bootstraps=20, seed=0)
print("per-signature bootstrap stability:",
      stability.stability.round(3).to_dict())

# 6. Checkpoint for later analysis.
sal.save_model(model, "klnmf_best.npz")
print("saved klnmf_best.npz; restore with sal.load_model(...)")
