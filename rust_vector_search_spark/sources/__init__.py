from .fixtures import TABLES, load_table, register_views
from .fasttext import read_fasttext_vec

__all__ = ["TABLES", "load_table", "register_views", "read_fasttext_vec"]
