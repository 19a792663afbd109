from .types_infer import profile_dataframe  # noqa: F401
from .temporal import detect_resolution  # noqa: F401
