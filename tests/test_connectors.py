"""External-connector seams: queue bridge (SQS-shaped) and S3A config.

The sandbox has no boto3/network, so the SQS contract is exercised
through FileQueueClient (same receive/visibility/delete protocol) and
the real client is pinned to fail loudly when its dependency is absent —
the same seam discipline as the Pillow/builtin codec path.
"""

from __future__ import annotations

import time

import pytest

from data_ingestion_worker_spark.sources.object_store import (
    configure_s3a,
    object_path,
    to_spark_path,
)
from data_ingestion_worker_spark.streaming.consumer import parse_job_messages
from data_ingestion_worker_spark.streaming.queue import (
    HAS_BOTO3,
    FileQueueClient,
    QueueBridge,
    SqsQueueClient,
    job_message,
)


def test_queue_receive_hides_in_flight_messages(tmp_path):
    q = FileQueueClient(str(tmp_path), visibility_timeout=60.0)
    for i in range(3):
        q.send(job_message(i, f"k{i}.csv"))
    first = q.receive(max_messages=2)
    assert len(first) == 2
    # In-flight messages are invisible; only the third is available.
    second = q.receive(max_messages=10)
    assert len(second) == 1
    assert {m.body for m in first} | {m.body for m in second} == {
        job_message(i, f"k{i}.csv") for i in range(3)
    }


def test_queue_visibility_timeout_redelivers(tmp_path):
    q = FileQueueClient(str(tmp_path), visibility_timeout=0.05)
    q.send(job_message(1, "a.csv"))
    got = q.receive()
    assert len(got) == 1          # claimed, not deleted (simulated crash)
    assert q.receive() == []      # still in flight
    time.sleep(0.08)
    redelivered = q.receive()     # visible again -> at-least-once
    assert [m.body for m in redelivered] == [got[0].body]


def test_queue_first_claim_is_exclusive(tmp_path, monkeypatch):
    """The claim is O_CREAT|O_EXCL: if another consumer creates it
    between this consumer's existence check and its create, this
    consumer loses the race and skips — no double-claim."""
    import os as _os

    q = FileQueueClient(str(tmp_path), visibility_timeout=60.0)
    q.send(job_message(1, "a.csv"))
    real_getmtime = _os.path.getmtime

    def racy_getmtime(p):
        p = str(p)
        if p.endswith(".claim"):
            # Interleave the rival's claim inside the check-then-create
            # window, then report "no claim existed" at check time.
            _os.close(_os.open(p, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY))
            raise OSError(p)
        return real_getmtime(p)

    monkeypatch.setattr(_os.path, "getmtime", racy_getmtime)
    assert q.receive() == []  # lost the race; message stays claimed once


def test_bridge_keeps_multiline_body_as_one_line(tmp_path, spark):
    """SQS bodies may embed newlines; the manifest is line-framed.  A
    pretty-printed JSON body must land as ONE parseable line and a
    multi-line poison body as ONE poison line (not two)."""
    import json as _json

    qdir, inbox = str(tmp_path / "q"), str(tmp_path / "inbox")
    q = FileQueueClient(qdir, visibility_timeout=60.0)
    pretty = _json.dumps({"job_id": 7, "s3_key": "k7.csv"}, indent=2)
    assert "\n" in pretty
    q.send(pretty)
    q.send("poison\nwith newline")
    assert QueueBridge(q, inbox).drain_once(max_messages=10) == 2
    raw = spark.read.text(inbox)
    assert raw.count() == 2                    # one line per message
    parsed = parse_job_messages(raw)
    assert [(r["job_id"], r["s3_key"]) for r in parsed.collect()] \
        == [(7, "k7.csv")]


def test_queue_delete_is_terminal(tmp_path):
    q = FileQueueClient(str(tmp_path), visibility_timeout=0.0)
    q.send(job_message(1, "a.csv"))
    m = q.receive()[0]
    q.delete(m.receipt_handle)
    assert q.receive() == [] and q.approximate_depth() == 0


def test_bridge_drains_queue_into_inbox_atomically(tmp_path, spark):
    qdir, inbox = str(tmp_path / "q"), str(tmp_path / "inbox")
    q = FileQueueClient(qdir, visibility_timeout=60.0)
    for i in range(5):
        q.send(job_message(i, f"k{i}.csv"))
    q.send("not json at all")  # poison must pass through, not vanish
    bridge = QueueBridge(q, inbox)
    n = bridge.drain_once(max_messages=10)
    assert n == 6
    assert q.approximate_depth() == 0          # acked after durable write
    import os
    assert not any(f.endswith(".tmp") for f in os.listdir(inbox))
    raw = spark.read.text(inbox)
    assert raw.count() == 6                    # poison line landed too
    parsed = parse_job_messages(raw)
    assert parsed.count() == 5                 # ...and is filtered in S3/S4
    assert {r["s3_key"] for r in parsed.collect()} == {
        f"k{i}.csv" for i in range(5)
    }


def test_queue_to_contacts_end_to_end(spark, tmp_path):
    """Full S1 path: queue -> bridge -> streaming consumer -> control
    tables. Two job messages and one poison body drain through the
    bridge; the consumer completes both jobs and ignores the poison."""
    from data_ingestion_worker_spark.control import ControlStore
    from data_ingestion_worker_spark.streaming import JobStreamConsumer
    from pyspark.sql import functions as F

    csvs = {}
    for jid, rows in ((1, b"ann@x.com,Ann,Ada,Acme\n"),
                      (2, b"bob@y.com,Bob,Bee,Bmart\n")):
        p = str(tmp_path / f"job{jid}.csv")
        with open(p, "wb") as f:
            f.write(b"email,first_name,last_name,company\n" + rows)
        csvs[jid] = p

    q = FileQueueClient(str(tmp_path / "q"), visibility_timeout=60.0)
    for jid, path in csvs.items():
        q.send(job_message(jid, path))
    q.send("{broken json")
    inbox = str(tmp_path / "inbox")
    assert QueueBridge(q, inbox).drain_once(max_messages=10) == 3
    assert q.approximate_depth() == 0

    store = ControlStore(spark, str(tmp_path / "control"))
    consumer = JobStreamConsumer(spark, store, inbox,
                                 str(tmp_path / "ckpt"))
    consumer.start(available_now=True).awaitTermination(120)
    assert sorted(consumer.results) == [(1, "initial"), (2, "initial")]
    jobs = {r["job_id"]: r["job_status"]
            for r in store.read("jobs").collect()}
    assert jobs == {1: "COMPLETED", 2: "COMPLETED"}
    emails = {r["contact_email"] for r in store.read("contacts").collect()}
    assert emails == {"ann@x.com", "bob@y.com"}


def test_bridge_run_is_bounded_and_incremental(tmp_path):
    qdir, inbox = str(tmp_path / "q"), str(tmp_path / "inbox")
    q = FileQueueClient(qdir, visibility_timeout=60.0)
    for i in range(7):
        q.send(job_message(i, f"k{i}.csv"))
    bridge = QueueBridge(q, inbox)
    total = bridge.run(poll_interval=0.0, max_drains=4, max_messages=2)
    assert total == 7  # 2+2+2+1 across four polls


@pytest.mark.skipif(HAS_BOTO3, reason="boto3 present; real client usable")
def test_sqs_client_raises_cleanly_without_boto3():
    with pytest.raises(NotImplementedError):
        SqsQueueClient("https://sqs.region.example/queue")


QUEUE_URL = "https://sqs.us-east-1.amazonaws.com/123456789012/jobs"


@pytest.mark.skipif(not HAS_BOTO3, reason="boto3 not installed")
def test_sqs_client_wire_protocol_with_stubber():
    """Pin the real boto3 call shapes (long-poll params, receipt-handle
    ack) without a network, via botocore's response stubber."""
    from botocore.stub import Stubber

    client = SqsQueueClient(QUEUE_URL, region="us-east-1",
                            visibility_timeout=120)
    stub = Stubber(client._sqs)
    stub.add_response(
        "receive_message",
        {"Messages": [{"MessageId": "m1", "Body": job_message(7, "x.csv"),
                       "ReceiptHandle": "rh1"}]},
        expected_params={"QueueUrl": QUEUE_URL, "MaxNumberOfMessages": 2,
                         "WaitTimeSeconds": 5, "VisibilityTimeout": 120},
    )
    stub.add_response(
        "delete_message", {},
        expected_params={"QueueUrl": QUEUE_URL, "ReceiptHandle": "rh1"},
    )
    with stub:
        msgs = client.receive(max_messages=2, wait_seconds=5)
        assert [(m.message_id, m.body, m.receipt_handle) for m in msgs] == [
            ("m1", job_message(7, "x.csv"), "rh1")
        ]
        client.delete("rh1")
    stub.assert_no_pending_responses()


@pytest.mark.skipif(not HAS_BOTO3, reason="boto3 not installed")
def test_bridge_over_real_sqs_client(tmp_path, spark):
    """The bridge drains a (stubbed) real SQS client into the inbox and
    acks each message after the manifest rename."""
    from botocore.stub import Stubber

    client = SqsQueueClient(QUEUE_URL, region="us-east-1")
    stub = Stubber(client._sqs)
    bodies = [job_message(i, f"k{i}.csv") for i in range(3)]
    stub.add_response(
        "receive_message",
        {"Messages": [
            {"MessageId": f"m{i}", "Body": b, "ReceiptHandle": f"rh{i}"}
            for i, b in enumerate(bodies)
        ]},
        expected_params={"QueueUrl": QUEUE_URL, "MaxNumberOfMessages": 10,
                         "WaitTimeSeconds": 0, "VisibilityTimeout": 300},
    )
    for i in range(3):
        stub.add_response(
            "delete_message", {},
            expected_params={"QueueUrl": QUEUE_URL,
                             "ReceiptHandle": f"rh{i}"},
        )
    inbox = str(tmp_path / "inbox")
    with stub:
        assert QueueBridge(client, inbox).drain_once(max_messages=10) == 3
    stub.assert_no_pending_responses()
    parsed = parse_job_messages(spark.read.text(inbox))
    assert {r["job_id"] for r in parsed.collect()} == {0, 1, 2}


def test_s3a_configuration_lands_in_hadoop_conf(spark):
    configure_s3a(spark, endpoint="http://localhost:9000",
                  access_key="ak", secret_key="sk",
                  path_style_access=True)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert conf.get("fs.s3a.access.key") == "ak"
    assert conf.get("fs.s3a.secret.key") == "sk"
    assert conf.get("fs.s3a.path.style.access") == "true"
    assert conf.get("fs.s3a.committer.name") == "magic"


@pytest.mark.skipif(not HAS_BOTO3, reason="boto3 not installed")
def test_s3_fetcher_stages_object_to_local_file(tmp_path):
    """Pin the real boto3 get_object shape; staged file lands atomically
    and byte-identically (a latin-1 payload must survive untouched)."""
    import io

    from botocore.response import StreamingBody
    from botocore.stub import Stubber

    from data_ingestion_worker_spark.sources.object_store import (
        S3ObjectFetcher,
    )

    payload = "name;city\nJosé;Köln\n".encode("latin-1")
    fetcher = S3ObjectFetcher("jobs-bucket", region="us-east-1")
    stub = Stubber(fetcher._s3)
    stub.add_response(
        "get_object",
        {"Body": StreamingBody(io.BytesIO(payload), len(payload))},
        expected_params={"Bucket": "jobs-bucket", "Key": "in/jobs.csv"},
    )
    dest = str(tmp_path / "staged" / "jobs.csv")
    with stub:
        out = fetcher.fetch_to_file("in/jobs.csv", dest)
    stub.assert_no_pending_responses()
    with open(out, "rb") as f:
        assert f.read() == payload
    import os
    assert not os.path.exists(dest + ".tmp")


def test_object_uri_normalization():
    assert to_spark_path("s3://b/path/to/obj.csv") == "s3a://b/path/to/obj.csv"
    assert to_spark_path("s3a://b/k") == "s3a://b/k"
    assert to_spark_path("/local/file.csv") == "/local/file.csv"
    assert to_spark_path("hdfs://nn/x") == "hdfs://nn/x"
    assert object_path("bucket", "/k/y.csv") == "s3a://bucket/k/y.csv"
