"""``python -m data_ingestion_worker_spark`` — the worker entrypoint."""

from .worker import main

raise SystemExit(main())
