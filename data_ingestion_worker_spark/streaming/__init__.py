from .consumer import JOB_MESSAGE_SCHEMA, JobStreamConsumer  # noqa: F401
from .heartbeat import StreamProgressListener  # noqa: F401
from .rollup import RollupSink  # noqa: F401
