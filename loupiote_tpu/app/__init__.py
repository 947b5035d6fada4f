from .checkpoint import (checkpoint_info, load_session, load_session_orbax,
                         save_session, save_session_orbax)
from .driver import Driver, EditorCommand
from .server import ViewerServer
from .timing import Queries, profiler_trace

__all__ = ["checkpoint_info", "load_session", "load_session_orbax",
           "save_session", "save_session_orbax", "Driver",
           "EditorCommand", "Queries", "profiler_trace", "ViewerServer"]
