from .lattice import cube_lattice  # noqa: F401
from .timeseries import (  # noqa: F401
    date_spine,
    densify,
    interpolate_linear,
    ewma,
    rolling_monotony_strain,
)
from .rollup import periodic_rollup  # noqa: F401
