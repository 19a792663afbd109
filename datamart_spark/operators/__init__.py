from .augment import join_augment, temporal_aligned_join, union_augment  # noqa: F401
