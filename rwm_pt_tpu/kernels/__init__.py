"""Fused sampler kernels (lax.scan + Pallas)."""
from .adapt import (AdaptiveLadderPTResult, AdaptivePTResult,
                    AdaptiveRWMResult, run_pt_adaptive,
                    run_pt_ladder_adaptive, run_rwm_adaptive)
from .pallas_pt import run_pt_pallas
from .pallas_rwm import run_rwm_pallas
from .pallas_sharded import (run_pt_pallas_sharded,
                             run_pt_pallas_tempsharded,
                             run_rwm_pallas_sharded)
from .pt import PTResult, PTState, pt_init, pt_step, run_pt
from .rwm import RWMResult, RWMState, run_rwm, rwm_init, rwm_step

__all__ = ["RWMState", "RWMResult", "rwm_init", "rwm_step", "run_rwm",
           "PTState", "PTResult", "pt_init", "pt_step", "run_pt",
           "run_rwm_pallas", "run_pt_pallas",
           "run_rwm_pallas_sharded", "run_pt_pallas_sharded",
           "run_pt_pallas_tempsharded",
           "AdaptiveRWMResult", "AdaptivePTResult", "AdaptiveLadderPTResult",
           "run_rwm_adaptive", "run_pt_adaptive", "run_pt_ladder_adaptive"]
