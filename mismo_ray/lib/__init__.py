from mismo_ray.lib import email, geo, name, phone

__all__ = ["email", "geo", "name", "phone"]
