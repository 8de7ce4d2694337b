"""Model zoo factory mirroring the reference Run.get_model (run.py:377-457)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from aread_tpu.config import Config
from aread_tpu.models.adasparse import AdaSparse
from aread_tpu.models.adl import ADL
from aread_tpu.models.aread import AREAD
from aread_tpu.models.autoint import AutoInt
from aread_tpu.models.base import CTRModel, FeatureSpec
from aread_tpu.models.dcn import DCN
from aread_tpu.models.dcnv2 import DCNv2
from aread_tpu.models.deepfm import DeepFM
from aread_tpu.models.hinet import HiNet
from aread_tpu.models.mamdr import MAMDR
from aread_tpu.models.mmoe import MMoE
from aread_tpu.models.pepnet import PEPNet
from aread_tpu.models.ple import PLE
from aread_tpu.models.star import STAR

__all__ = [
    "ADL", "AREAD", "AdaSparse", "AutoInt", "CTRModel", "DCN", "DCNv2",
    "DeepFM", "FeatureSpec", "HiNet", "MAMDR", "MMoE", "PEPNet", "PLE",
    "STAR", "build_model",
]


def build_model(config: Config, spec: FeatureSpec, n_domain: int,
                n_tower: Optional[int] = None) -> CTRModel:
    """Instantiate a zoo model by config.model with the reference's
    hyper-parameter wiring (run.py:377-457)."""
    name = config.model
    e = config.embed_dim
    if n_tower is None:
        # cap by n_domain: a dataset with fewer domains than the default
        # 3-group fallback (Config.n_tower) must not build empty towers
        # (wasted params + per-tower reductions over empty groups)
        n_tower = min(config.n_tower, n_domain)
    if config.sparse_table_grad:
        # lane-packed [n_rows*E/128, 128] table storage: on TPU a
        # [N, E<128] f32 table is physically lane-padded 4x and every
        # flat<->packed reshape is a multi-ms relayout; storing flat lets
        # the sparse/fused Adam kernels update in place at true byte size
        # (ops/embedding.py, ops/sparse_adam.py). No-op if 128 % E != 0.
        spec = spec.with_flat_table(e)
    if config.table_dtype != spec.table_dtype:
        # bf16 table storage with stochastic-rounded optimizer writes
        # (config.table_dtype; ops/rounding.py)
        import dataclasses as _dc
        spec = _dc.replace(spec, table_dtype=config.table_dtype)
    common_att = dict(atten_embed_dim=config.atten_embed_dim,
                      att_layer_num=config.att_layer_num,
                      att_head_num=config.att_head_num,
                      att_res=config.att_res)
    if name == "deepfm":
        return DeepFM(spec=spec, embed_dim=e, mlp_dims=(256, 128), dropout=config.dropout)
    if name == "dcn":
        return DCN(spec=spec, embed_dim=e, n_cross_layers=3,
                   mlp_dims=config.mlp_dims, dropout=config.dropout)
    if name == "dcnv2":
        return DCNv2(spec=spec, embed_dim=e, n_cross_layers=3,
                     mlp_dims=config.mlp_dims, dropout=config.dropout)
    if name == "autoint":
        return AutoInt(spec=spec, embed_dim=e, mlp_dims=config.mlp_dims,
                       dropout=config.dropout, **common_att)
    if name == "ple":
        return PLE(spec=spec, embed_dim=e, n_tower=n_tower,
                   n_expert_specific=config.ple_n_expert_specific,
                   n_expert_shared=config.ple_n_expert_shared,
                   expert_dims=config.ple_expert_dims,
                   tower_dims=config.ple_tower_dims, dropout=config.dropout,
                   use_dcn=config.use_dcn, use_atten=config.use_atten,
                   n_cross_layers=config.n_cross_layers, **common_att)
    if name == "mmoe":
        return MMoE(spec=spec, embed_dim=e, n_tower=n_tower,
                    n_expert=config.mmoe_n_expert,
                    expert_dims=config.mmoe_expert_dims,
                    tower_dims=config.mmoe_tower_dims, dropout=config.dropout,
                    use_dcn=config.use_dcn, use_atten=config.use_atten,
                    n_cross_layers=config.n_cross_layers, **common_att)
    if name in ("pepnet", "epnet", "epnet-single"):
        return PEPNet(spec=spec, embed_dim=e,
                      n_tower=1 if name == "epnet-single" else n_tower,
                      tower_dims=config.tower_dims, gate_hidden_dim=64,
                      use_ppnet=(name == "pepnet"), dropout=config.dropout,
                      use_dcn=config.use_dcn, use_atten=config.use_atten,
                      n_cross_layers=config.n_cross_layers, **common_att)
    if name == "star":
        return STAR(spec=spec, embed_dim=e, n_tower=n_tower,
                    tower_dims=config.tower_dims, dropout=config.dropout,
                    use_atten=config.use_atten, **common_att)
    if name == "adl":
        return ADL(spec=spec, embed_dim=e, n_tower=n_tower,
                   tower_dims=config.tower_dims, dlm_iters=config.dlm_iters,
                   eval_dlm_update=config.adl_eval_dlm_update,
                   dropout=config.dropout, use_dcn=config.use_dcn,
                   use_atten=config.use_atten,
                   n_cross_layers=config.n_cross_layers, **common_att)
    if name == "hinet":
        return HiNet(spec=spec, embed_dim=e, n_tower=n_tower,
                     sei_dims=config.sei_dims, tower_dims=config.tower_dims,
                     dropout=config.dropout, use_dcn=config.use_dcn,
                     use_atten=config.use_atten,
                     n_cross_layers=config.n_cross_layers, **common_att)
    if name == "adasparse":
        return AdaSparse(spec=spec, embed_dim=e, hidden_dims=config.mlp_dims,
                         dropout=config.dropout, use_dcn=config.use_dcn,
                         use_atten=config.use_atten,
                         n_cross_layers=config.n_cross_layers, **common_att)
    if name == "mamdr":
        return MAMDR(spec=spec, embed_dim=e, mlp_dims=(256, 128), dropout=config.dropout)
    if name in ("aread", "aread_womask"):
        towers = tuple(n_tower * (2 ** l) for l in range(len(config.aread_tower_dims)))
        return AREAD(spec=spec, embed_dim=e, n_tower=towers, n_domain=n_domain,
                     base_model=config.base_model, expert_dims=config.mlp_dims,
                     tower_dims=config.aread_tower_dims, dropout=config.dropout,
                     use_dcn=config.use_dcn, n_cross_layers=config.n_cross_layers,
                     mmoe_n_expert=config.mmoe_n_expert,
                     ple_n_expert_specific=config.ple_n_expert_specific,
                     ple_n_expert_shared=config.ple_n_expert_shared,
                     ple_expert_dims=config.ple_expert_dims)
    raise ValueError(f"Unknown model: {name}")
