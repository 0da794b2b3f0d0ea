from mismo_ray.compare._level_comparer import LevelComparer, compare

__all__ = ["LevelComparer", "compare"]
