"""Streaming consumer tests: the SQS-analogue inbox end-to-end (T1-T3).

A job message dropped in the inbox drives the full lifecycle through
``foreachBatch``; poison messages are discarded (S3); the checkpoint
makes a second drain a no-op (S2 ack semantics).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_ingestion_worker_spark.control import ControlStore
from data_ingestion_worker_spark.streaming import JobStreamConsumer

CSV = (b"email,first_name,last_name,company\n"
       b"ann@x.com,Ann,Ada,Acme\n"
       b"bob@x.com,Bob,Bee,Bmart\n")


def test_stream_drives_job_lifecycle(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    csv_path = str(tmp_path / "job7.csv")
    with open(csv_path, "wb") as f:
        f.write(CSV)
    # One valid message, one poison (bad JSON), one incomplete (S4).
    (inbox / "m1.json").write_text(
        json.dumps({"job_id": 7, "s3_key": csv_path}) + "\n"
        + "{not json]\n"
        + json.dumps({"job_id": None, "s3_key": csv_path}) + "\n"
    )
    store = ControlStore(spark, str(tmp_path / "control"))
    consumer = JobStreamConsumer(
        spark, store, str(inbox), str(tmp_path / "ckpt")
    )
    consumer.start(available_now=True).awaitTermination(120)

    assert consumer.results == [(7, "initial")]
    job = store.read("jobs").filter(F.col("job_id") == 7).collect()[0]
    assert job["job_status"] == "COMPLETED"     # clean CSV -> consolidated
    assert store.read("contacts").count() == 2

    # S2: the checkpoint acks the batch — a second drain reprocesses
    # nothing (no new files).
    consumer2 = JobStreamConsumer(
        spark, store, str(inbox), str(tmp_path / "ckpt")
    )
    consumer2.start(available_now=True).awaitTermination(120)
    assert consumer2.results == []


def test_unreadable_csv_does_not_wedge_stream(spark, tmp_path):
    """A parsable message with a missing CSV must be consumed as an
    error, not fail the microbatch (which the checkpoint would replay
    forever, blocking every later job)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    good_csv = str(tmp_path / "ok.csv")
    with open(good_csv, "wb") as f:
        f.write(CSV)
    (inbox / "m1.json").write_text(
        json.dumps({"job_id": 8, "s3_key": str(tmp_path / "missing.csv")})
        + "\n" + json.dumps({"job_id": 9, "s3_key": good_csv}) + "\n"
    )
    store = ControlStore(spark, str(tmp_path / "control"))
    consumer = JobStreamConsumer(
        spark, store, str(inbox), str(tmp_path / "ckpt")
    )
    consumer.start(available_now=True).awaitTermination(120)
    results = dict(consumer.results)
    assert results[9] == "initial"                 # good job processed
    assert results[8].startswith("error:")         # bad one isolated
    # Checkpoint advanced past the failing message: next drain is empty.
    consumer2 = JobStreamConsumer(
        spark, store, str(inbox), str(tmp_path / "ckpt")
    )
    consumer2.start(available_now=True).awaitTermination(120)
    assert consumer2.results == []


def _drain(spark, store, inbox, ckpt, n, **kw):
    c = JobStreamConsumer(spark, store, str(inbox), str(ckpt), **kw)
    c.start(available_now=True).awaitTermination(120)
    return c.results


def test_rate_limited_drain_processes_everything(spark, tmp_path):
    """maxFilesPerTrigger=1 (the reference's one-message-at-a-time SQS
    setting) splits the drain into one microbatch per manifest file but
    must still process every job exactly once."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    store = ControlStore(spark, str(tmp_path / "control"))
    for i, job in enumerate((31, 32, 33)):
        csv_path = str(tmp_path / f"j{job}.csv")
        # Distinct emails per job — reusing one address would (correctly)
        # trip EXISTING_EMAIL for the later jobs once the first
        # consolidates into the shared tenant's contacts.
        with open(csv_path, "wb") as f:
            f.write(b"email,first_name,last_name,company\n"
                    b"u%d@x.com,Ann,Ada,Acme\n" % job)
        (inbox / f"m{i}.json").write_text(
            json.dumps({"job_id": job, "s3_key": csv_path}) + "\n"
        )
    consumer = JobStreamConsumer(
        spark, store, str(inbox), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    consumer.start(available_now=True).awaitTermination(180)
    assert sorted(consumer.results) == [(31, "initial"), (32, "initial"),
                                        (33, "initial")]
    done = store.read("jobs").filter(F.col("job_status") == "COMPLETED")
    assert done.count() == 3


def test_dead_letter_retry_budget(spark, tmp_path):
    """A failing job is retried on later batches until max_receive_count,
    then dead-lettered (status=DEAD) and never retried again."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    store = ControlStore(spark, str(tmp_path / "control"))
    missing = str(tmp_path / "never-created.csv")
    (inbox / "m1.json").write_text(
        json.dumps({"job_id": 20, "s3_key": missing}) + "\n"
    )
    kw = {"max_receive_count": 2}
    r1 = _drain(spark, store, inbox, tmp_path / "ckpt", 1, **kw)
    assert r1[0][0] == 20 and r1[0][1].startswith("error:")
    dl = store.read("dead_letters").collect()[0]
    assert (dl["dlq_attempts"], dl["dlq_status"]) == (1, "RETRYING")

    # Any later batch retries it; second failure exhausts the budget.
    (inbox / "m2.json").write_text("{poison}\n")   # fires a batch, no jobs
    r2 = _drain(spark, store, inbox, tmp_path / "ckpt", 2, **kw)
    assert r2[0][0] == 20 and r2[0][1].startswith("error:")
    dl = store.read("dead_letters").collect()[0]
    assert (dl["dlq_attempts"], dl["dlq_status"]) == (2, "DEAD")
    assert "never-created" in dl["dlq_error"]
    # Budget exhausted => the job row itself is terminal (reference
    # JobStatus.FAILED on exception): a status poll must not see an
    # eternal PROCESSING.
    job = store.read("jobs").filter(F.col("job_id") == 20).collect()[0]
    assert job["job_status"] == "FAILED"
    assert "never-created" in job["job_error"]
    assert job["job_process_end"] is not None

    # DEAD entries are parked: a third batch does not retry job 20.
    (inbox / "m3.json").write_text("{poison}\n")
    r3 = _drain(spark, store, inbox, tmp_path / "ckpt", 3, **kw)
    assert r3 == []


def test_progress_heartbeat_updates_during_drain(spark, tmp_path):
    """T4 drain-level heartbeat: with maxFilesPerTrigger=1 a 3-file
    drain runs >= 3 microbatches; the listener publishes a
    stream_progress row per batch — progress is visible in the store
    while the query is still running, and the mid-job stage heartbeat
    leaves job_processed_rows populated."""
    from data_ingestion_worker_spark.streaming import StreamProgressListener

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    store = ControlStore(spark, str(tmp_path / "control"))
    for i, job in enumerate((41, 42, 43)):
        csv_path = str(tmp_path / f"j{job}.csv")
        with open(csv_path, "wb") as f:
            f.write(b"email,first_name,last_name,company\n"
                    b"h%d@x.com,Ann,Ada,Acme\n" % job)
        (inbox / f"m{i}.json").write_text(
            json.dumps({"job_id": job, "s3_key": csv_path}) + "\n"
        )
    listener = StreamProgressListener(spark, store)
    spark.streams.addListener(listener)
    try:
        consumer = JobStreamConsumer(
            spark, store, str(inbox), str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        )
        q = consumer.start(available_now=True)
        listener.watch(q)
        q.awaitTermination(180)
        # Listener events are async — wait for the final upsert to land.
        import time
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = store.read("stream_progress").filter(
                F.col("progress_query_id") == str(q.id)
            ).collect()
            if len(rows) >= 3:
                break
            time.sleep(1)
        batch_ids = sorted(r["progress_batch_id"] for r in rows)
        assert len(batch_ids) >= 3           # one heartbeat per microbatch
        assert batch_ids == sorted(set(batch_ids))
        assert sum(r["progress_input_rows"] for r in rows) == 3
        # Mid-job stage heartbeat: processed rows published per job.
        jobs = {r["job_id"]: r for r in store.read("jobs").collect()}
        assert all(jobs[j]["job_processed_rows"] == 1 for j in (41, 42, 43))
    finally:
        spark.streams.removeListener(listener)


def test_dead_letter_cleared_on_successful_retry(spark, tmp_path):
    """A retry that succeeds completes the job and drops the DLQ entry."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    store = ControlStore(spark, str(tmp_path / "control"))
    late_csv = str(tmp_path / "late.csv")
    (inbox / "m1.json").write_text(
        json.dumps({"job_id": 21, "s3_key": late_csv}) + "\n"
    )
    r1 = _drain(spark, store, inbox, tmp_path / "ckpt", 1)
    assert r1[0][1].startswith("error:")
    assert store.read("dead_letters").count() == 1

    # The file appears before the next batch -> retry succeeds.
    with open(late_csv, "wb") as f:
        f.write(CSV)
    (inbox / "m2.json").write_text("{poison}\n")
    r2 = _drain(spark, store, inbox, tmp_path / "ckpt", 2)
    assert r2 == [(21, "initial")]
    assert store.read("dead_letters").count() == 0
    job = store.read("jobs").filter(F.col("job_id") == 21).collect()[0]
    assert job["job_status"] == "COMPLETED"


def test_worker_entrypoint_drain_cycle(spark, tmp_path, monkeypatch):
    """The deployable worker (reference main.py twin): a message put on
    the queue is bridged to the inbox, processed through the full
    routing/validation flow, and the job lands NEEDS_REVIEW/COMPLETED
    in the control store — all wired purely from the environment."""
    from data_ingestion_worker_spark.streaming.queue import job_message
    from data_ingestion_worker_spark.worker import build_worker

    monkeypatch.setenv("SPARK_INGEST_ROOT", str(tmp_path / "w"))
    monkeypatch.setenv("SPARK_INGEST_USER_ID", "user-9")
    csv_path = str(tmp_path / "clean.csv")
    with open(csv_path, "wb") as f:
        f.write(b"email,first_name,last_name,company\n"
                b"a@x.com,A,Aa,Acme\n")

    bridge, consumer = build_worker(spark)
    bridge.client.send(job_message(1, csv_path))
    assert bridge.drain_once(max_messages=1) == 1
    consumer.start(available_now=True).awaitTermination(120)

    jobs = consumer.store.read("jobs").collect()
    assert [(r.job_id, r.job_status) for r in jobs] == [(1, "COMPLETED")]
    contacts = consumer.store.read("contacts").collect()
    assert [(r.contact_email, r.contacts_user_id) for r in contacts] \
        == [("a@x.com", "user-9")]


def test_worker_once_and_drain_flags(spark, tmp_path, monkeypatch):
    """``--once`` bridges exactly one poll cycle (one message at the
    default max_messages=1); ``--drain`` then empties the queue.  Both
    documented invocations must actually parse and run (round-5 ADVICE:
    the docstring advertised --once before the flag existed)."""
    from data_ingestion_worker_spark.streaming.queue import (
        FileQueueClient, job_message)
    from data_ingestion_worker_spark.worker import main

    root = tmp_path / "w2"
    monkeypatch.setenv("SPARK_INGEST_ROOT", str(root))
    monkeypatch.setenv("SPARK_INGEST_USER_ID", "user-2")
    qdir = root / "queue"
    qdir.mkdir(parents=True)
    monkeypatch.setenv("SPARK_INGEST_QUEUE_DIR", str(qdir))
    for j in (1, 2):
        csv_path = str(tmp_path / f"once{j}.csv")
        with open(csv_path, "wb") as f:
            f.write(b"email,first_name,last_name,company\n"
                    + f"u{j}@x.com,U,{j},Acme\n".encode())
        FileQueueClient(str(qdir)).send(job_message(j, csv_path))

    assert main(["--once"]) == 0            # one poll -> exactly one job
    from data_ingestion_worker_spark.control import ControlStore
    store = ControlStore(spark, str(root / "control"))
    first = {r.job_id for r in store.read("jobs").collect()}
    assert len(first) == 1 and first <= {1, 2}   # queue order is arbitrary

    assert main(["--drain"]) == 0           # empties the queue -> the other
    done = {(r.job_id, r.job_status) for r in store.read("jobs").collect()}
    assert done == {(1, "COMPLETED"), (2, "COMPLETED")}
