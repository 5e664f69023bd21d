from mmtrs_tpu.fusion.weight_search import grid_simplex, blended_prob, search_weights
from mmtrs_tpu.fusion.meta import MetaStacker
from mmtrs_tpu.fusion.stack import fit_tab_oof, run_final_stack, run_tabular_stack
from mmtrs_tpu.fusion.fuse import fit_fusion
from mmtrs_tpu.fusion.infer import load_recipe, fuse_streams

__all__ = [
    "grid_simplex",
    "blended_prob",
    "search_weights",
    "MetaStacker",
    "fit_tab_oof",
    "run_final_stack",
    "run_tabular_stack",
    "fit_fusion",
    "load_recipe",
    "fuse_streams",
]
