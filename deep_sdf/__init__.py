"""Reference-compatible facade package.

Lets code written against the reference's ``deep_sdf`` package (ref:
deep_sdf/__init__.py) run on this framework unchanged for the common
surfaces: ``deep_sdf.workspace``, ``deep_sdf.data``, ``deep_sdf.mesh``,
``deep_sdf.utils``, ``deep_sdf.metrics.chamfer``, ``deep_sdf.plotting``.

The underlying model object is a :class:`LoadedDecoder` (config +
params pytree) that is callable like the reference's torch module.
"""

from deepsdf_tpu.utils import add_common_args, configure_logging  # noqa: F401

from . import data, mesh, plotting, utils, workspace  # noqa: F401
from . import workspace as ws  # noqa: F401
