from .matio import load_matlab_file
from .splits import (
    load_data_monti,
    load_official_trainvaltest_split,
    create_trainvaltest_split,
    SplitData,
)
from .loaders import load_data, map_data, download_dataset, raw_data_dir
from .synthetic import synthesize_ratings, write_ml1m_format

__all__ = [
    "load_matlab_file",
    "load_data_monti",
    "load_official_trainvaltest_split",
    "create_trainvaltest_split",
    "SplitData",
    "load_data",
    "map_data",
    "download_dataset",
    "raw_data_dir",
    "synthesize_ratings",
    "write_ml1m_format",
]
