"""Model registry — named configurations covering BASELINE.json's configs."""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

from transception_tpu.core.config import TransceptionConfig


def _transception(cfg: TransceptionConfig):
    from transception_tpu.models.transception import MSTransception
    return MSTransception(cfg)


def _transception_legacy(cfg: TransceptionConfig):
    from transception_tpu.models.legacy import Transception
    return Transception(cfg)


def _missformer(cfg: TransceptionConfig):
    from transception_tpu.models.legacy import MISSFormer
    return MISSFormer(cfg)


def _eff_missformer(cfg: TransceptionConfig):
    from transception_tpu.models.legacy import EffMISSFormer
    return EffMISSFormer(cfg)


MODEL_REGISTRY: Dict[str, Callable] = {
    # The published model (networks/MSTr.py:2759).
    "mstransception": _transception,
    # 4-stage and casa backbone variants.
    "mstransception_4stage": lambda cfg: _transception(
        dataclasses.replace(cfg, stage_3or4=4)),
    "mstransception_casa": lambda cfg: _transception(
        dataclasses.replace(cfg, stage_3or4=0, concat="cbam")),
    # sp / para bridges.
    "mstransception_sp": lambda cfg: _transception(
        dataclasses.replace(cfg, have_bridge="sp", num_sp=1)),
    "mstransception_para": lambda cfg: _transception(
        dataclasses.replace(cfg, have_bridge="para")),
    # Legacy two-branch inception encoder (networks/Transception.py:1010).
    "transception": _transception_legacy,
    # Baselines rebuilt from the reference's duplicated segformer blocks.
    "missformer": _missformer,
    "effmissformer": _eff_missformer,
    # ResInception variant (comment.py, dead in the reference) — rebuilt
    # intended semantics; inception key picks the MultiRes branch set.
    "resinception": lambda cfg: __import__(
        "transception_tpu.models.legacy", fromlist=["ResInceptionTransception"]
    ).ResInceptionTransception(cfg),
    "resinception_135": lambda cfg: __import__(
        "transception_tpu.models.legacy", fromlist=["ResInceptionTransception"]
    ).ResInceptionTransception(cfg, inception="135"),
}


def create_model(name: str, cfg: TransceptionConfig = None):
    cfg = cfg or TransceptionConfig()
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise KeyError(f"unknown model '{name}'; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[key](cfg)
