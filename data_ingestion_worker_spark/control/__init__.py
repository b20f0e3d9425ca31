from .jdbc_store import JdbcControlStore  # noqa: F401
from .processor import JobProcessor  # noqa: F401
from .store import ControlStore  # noqa: F401
