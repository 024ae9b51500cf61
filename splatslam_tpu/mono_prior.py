"""Monocular depth prior providers.

Reference: src/mono_estimators.py:21-73 (omnidata DPT wrapper that
predicts per keyframe and caches .npy files) plus the offline path
(datasets.py:60-66, mono_prior.predict_online=False).

Providers:
  * "files"  — load precomputed `<out>/mono_priors/depths/<idx:05d>.npy`
               (reference offline path, byte-compatible layout).
  * "oracle" — dataset GT depth warped by a fixed affine distortion; lets
               the full DSPO / depth-fusion path run end-to-end in
               environments without the omnidata checkpoint (none ships
               here). Clearly synthetic — for smoke tests and benches.
  * "dpt"    — omnidata DPT-hybrid network (models/dpt.py); requires the
               converted checkpoint, errors out otherwise.
  * "none"   — no prior (tracking-only setups).

All providers return a full-resolution (H, W) float32 depth map or None,
and optionally persist it like the reference
(mono_estimators.py:predict_mono_depth saves .npy per keyframe).
"""

from __future__ import annotations

import os

import numpy as np


class MonoDepthProvider:
    def __init__(self, cfg, dataset, save_dir):
        self.cfg = cfg
        self.dataset = dataset
        self.save_dir = save_dir
        mp = cfg.get("mono_prior", {})
        self.kind = mp.get("provider", "oracle" if cfg.get("dataset") ==
                           "synthetic" else "files")
        self.save = mp.get("save_depths", True)
        self._dpt = None
        if self.kind == "dpt":
            from .models.dpt import DPTDepthPredictor
            self._dpt = DPTDepthPredictor(
                mp.get("depth_pretrained", "pretrained/omnidata_dpt_depth_v2.ckpt"))
        self._cache: dict[int, np.ndarray] = {}
        # stale-cache guard: .npy files written by a PREVIOUS run with a
        # different provider must not be silently reused ("files" mode
        # excepted — there the files ARE the input)
        self._use_disk = True
        if self.kind not in ("files", "none"):
            marker = os.path.join(self.save_dir, "mono_priors", "depths",
                                  ".provider")
            prev = None
            if os.path.exists(marker):
                with open(marker) as f:
                    prev = f.read().strip()
            if prev is not None and prev != self.kind:
                print(f"[mono_prior] cached depths were produced by "
                      f"provider={prev!r}; recomputing with "
                      f"{self.kind!r}", flush=True)
                self._use_disk = False
            if self.save:
                os.makedirs(os.path.dirname(marker), exist_ok=True)
                with open(marker, "w") as f:
                    f.write(self.kind)

    def _path(self, idx):
        return os.path.join(self.save_dir, "mono_priors", "depths",
                            f"{idx:05d}.npy")

    def __call__(self, idx):
        idx = int(idx)
        if self.kind == "none":
            return None
        if idx in self._cache:
            return self._cache[idx]
        p = self._path(idx)
        if self._use_disk and os.path.exists(p):
            d = np.load(p)
        elif self.kind == "files":
            raise FileNotFoundError(
                f"mono prior not found: {p}. Pre-run the depth predictor or "
                "switch mono_prior.provider.")
        elif self.kind == "oracle":
            _, _, depth, _ = self.dataset[idx]
            if depth is None:
                return None
            # affine distortion IN DISPARITY (the DSPO stage-2 model,
            # geom/ba.py:169: disps − (w·mono_disp + q)): the tracker must
            # recover w=2, q=-0.4. (A depth-affine prior is not exactly
            # representable by (w, q) and would fight stage 1.)
            z = np.asarray(depth, np.float32)
            mono_disp = np.where(z > 1e-6, 0.5 / np.maximum(z, 1e-6) + 0.2,
                                 0.0)
            d = np.where(mono_disp > 1e-6, 1.0 / np.maximum(mono_disp, 1e-6),
                         0.0)
        elif self.kind == "dpt":
            _, color, _, _ = self.dataset[idx]
            d = self._dpt(np.asarray(color))
        else:
            raise ValueError(self.kind)
        if self.save and (not self._use_disk or not os.path.exists(p)):
            os.makedirs(os.path.dirname(p), exist_ok=True)
            np.save(p, d)   # overwrites stale other-provider files
        self._cache[idx] = d
        if len(self._cache) > 64:
            self._cache.pop(next(iter(self._cache)))
        return d
