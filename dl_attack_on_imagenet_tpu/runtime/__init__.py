from .host_loader import HostLoader, NativeRuntime, get_runtime  # noqa: F401
