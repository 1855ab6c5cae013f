from .scalars import time_dims, year_week, year_month, strip_spaces, key_concat  # noqa: F401
from .mappers import MAPPERS  # noqa: F401
