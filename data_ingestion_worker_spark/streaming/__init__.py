from .consumer import JOB_MESSAGE_SCHEMA, JobStreamConsumer  # noqa: F401
