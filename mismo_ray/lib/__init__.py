from mismo_ray.lib import address, company, dimensions, email, geo, name, phone, postal, robots
from mismo_ray.lib.dimensions import (
    AddressesDimension,
    EmailsDimension,
    NameDimension,
    PhonesDimension,
)

__all__ = [
    "AddressesDimension",
    "EmailsDimension",
    "NameDimension",
    "PhonesDimension",
    "address",
    "company",
    "dimensions",
    "email",
    "geo",
    "name",
    "phone",
    "postal",
    "robots",
]
