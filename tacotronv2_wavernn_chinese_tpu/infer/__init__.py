from .gta import generate_gta, merge_shards
from .synthesizer import Synthesizer

__all__ = ["Synthesizer", "generate_gta", "merge_shards"]
