from mismo_ray.lib import address, email, geo, name, phone

__all__ = ["address", "email", "geo", "name", "phone"]
