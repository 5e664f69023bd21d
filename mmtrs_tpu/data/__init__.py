from mmtrs_tpu.data.features import (
    BASE_FEATURES,
    ENGINEERED_FEATURES,
    ALL_FEATURES,
    build_features,
    engineer_features_jax,
)
from mmtrs_tpu.data.standardize import standardize_table, compute_targets, add_split
from mmtrs_tpu.data.splits import (
    grouped_train_test_split,
    group_kfold,
    stratified_kfold,
    stratified_group_kfold,
    balanced_grouped_split,
    propagate_split_to_augmented,
    audit_report,
)

__all__ = [
    "BASE_FEATURES",
    "ENGINEERED_FEATURES",
    "ALL_FEATURES",
    "build_features",
    "engineer_features_jax",
    "standardize_table",
    "compute_targets",
    "add_split",
    "grouped_train_test_split",
    "group_kfold",
    "stratified_kfold",
    "stratified_group_kfold",
    "balanced_grouped_split",
    "propagate_split_to_augmented",
    "audit_report",
]
