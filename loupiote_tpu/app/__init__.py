from .checkpoint import checkpoint_info, load_session, save_session
from .driver import Driver, EditorCommand
from .server import ViewerServer
from .timing import Queries, profiler_trace

__all__ = ["checkpoint_info", "load_session", "save_session", "Driver",
           "EditorCommand", "Queries", "profiler_trace", "ViewerServer"]
