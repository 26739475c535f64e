from flex_tpu.io.csv_loader import load_csv, make_features, save_csv
from flex_tpu.io.synth import rmat_graph, uniform_graph, banded_graph, reddit_like

__all__ = [
    "load_csv",
    "save_csv",
    "make_features",
    "rmat_graph",
    "uniform_graph",
    "banded_graph",
    "reddit_like",
]
