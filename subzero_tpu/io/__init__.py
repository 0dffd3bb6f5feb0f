from .logger import SimulationLogger  # noqa: F401
from .writers import (  # noqa: F401
    CheckpointOutputWriter,
    FloeOutputWriter,
    GridOutputWriter,
    InitialStateOutputWriter,
    OutputWriters,
    eulerian_data,
    restart,
)
