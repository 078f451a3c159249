from .framework import (  # noqa: F401
    SDFBase,
    SummedSDF,
    NegatedCallable,
    BoxSDF,
    RandomSampleSDF,
    SDFSampler,
    random_sample_sdf,
)
from .microstructures import CrossMsSDF, CornerSpheresSDF  # noqa: F401
from .mesh_sdf import SDFfromMesh  # noqa: F401
