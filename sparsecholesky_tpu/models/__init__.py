from .generators import (  # noqa: F401
    THESIS_PATTERN,
    THESIS_ETREE,
    THESIS_REACH_COL5,
    poisson2d,
    poisson3d,
    random_sparse,
    random_sparse_on_pattern,
)
