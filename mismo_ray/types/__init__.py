from mismo_ray.types._linkage import Linkage, LinksTable

__all__ = ["Linkage", "LinksTable"]
