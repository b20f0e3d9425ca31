"""Queue-source seam: the reference's real SQS connector, Spark-first.

Reference behavior being matched (not copied): an SQS long-poll with
``receive_message(MaxNumberOfMessages, WaitTimeSeconds,
VisibilityTimeout)`` (``src/consumer.py:55-87``) and
``delete_message(receipt_handle)`` only after successful processing
(``src/consumer.py:203-218``; delete-on-success S2).

Spark has no SQS streaming source, and it should not: queue messages are
~100-byte job pointers (control plane), while the data they point at is
read as distributed scans.  The scalable shape is therefore a tiny
driver-side **bridge** that drains the queue into the file inbox the
Structured-Streaming consumer (``consumer.JobStreamConsumer``) already
tails — one JSON line per message, written atomically — and deletes each
message only AFTER its manifest file is durable.  The delete-on-success
contract moves one hop earlier; the streaming checkpoint plus the
idempotent job flows (ADR-001 anti-joins) keep the end-to-end guarantee
at-least-once ⇒ effectively exactly-once, unchanged.

``SqsQueueClient`` is the real connector, gated on boto3 exactly like the
Pillow seam in ``operators/multimodal.py`` (:data:`HAS_BOTO3`).  There is
no network in this sandbox, so its wire protocol is pinned with
botocore's ``Stubber`` against the real client object
(``tests/test_connectors.py``), and the end-to-end drain path is
exercised through ``FileQueueClient``, which implements the same
receive/visibility/delete contract over a local directory.
"""

from __future__ import annotations

import importlib.util
import json
import os
import time
import uuid
from dataclasses import dataclass

#: True when boto3 is importable — the real-SQS seam.
HAS_BOTO3: bool = importlib.util.find_spec("boto3") is not None


@dataclass(frozen=True)
class QueueMessage:
    message_id: str
    body: str
    receipt_handle: str


class FileQueueClient:
    """Directory-backed queue with the SQS receive/delete contract.

    Each pending message is one ``*.msg`` file.  ``receive`` hides a
    message for ``visibility_timeout`` seconds (a sidecar ``.claim``
    mtime marks the claim) — an unclaimed redelivery after the timeout,
    exactly the SQS at-least-once behavior the consumer's dead-letter
    budget is designed around.
    """

    def __init__(self, queue_dir: str, visibility_timeout: float = 30.0):
        self.queue_dir = queue_dir
        self.visibility_timeout = visibility_timeout
        os.makedirs(queue_dir, exist_ok=True)

    def send(self, body: str) -> str:
        mid = uuid.uuid4().hex
        path = os.path.join(self.queue_dir, f"{mid}.msg")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(body)
        os.rename(tmp, path)
        return mid

    def receive(self, max_messages: int = 1,
                wait_seconds: float = 0.0) -> list[QueueMessage]:
        out: list[QueueMessage] = []
        now = time.time()
        for name in sorted(os.listdir(self.queue_dir)):
            if not name.endswith(".msg") or len(out) >= max_messages:
                continue
            path = os.path.join(self.queue_dir, name)
            claim = path + ".claim"
            try:
                claim_mtime = os.path.getmtime(claim)
            except OSError:  # no claim yet (or concurrently deleted)
                claim_mtime = None
            if claim_mtime is not None and \
                    now - claim_mtime < self.visibility_timeout:
                continue  # in flight, not yet visible again
            if claim_mtime is None:
                # First claim: O_EXCL makes it exclusive — two concurrent
                # consumers cannot both claim an unclaimed message.
                try:
                    os.close(os.open(claim,
                                     os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                except FileExistsError:
                    continue  # lost the race to another consumer
            else:
                # Expired claim: refresh its mtime atomically.  Like SQS
                # itself, visibility-timeout expiry is the at-least-once
                # window — a redelivery race here is within contract.
                tmp = f"{claim}.{uuid.uuid4().hex}.tmp"
                os.close(os.open(tmp, os.O_CREAT | os.O_WRONLY))
                os.replace(tmp, claim)
            try:
                with open(path, encoding="utf-8") as f:
                    body = f.read()
            except FileNotFoundError:
                continue  # deleted by a concurrent consumer's ack
            mid = name[:-4]
            out.append(QueueMessage(mid, body, receipt_handle=mid))
        return out

    def delete(self, receipt_handle: str) -> None:
        path = os.path.join(self.queue_dir, f"{receipt_handle}.msg")
        if os.path.exists(path):
            os.remove(path)
        claim = path + ".claim"
        if os.path.exists(claim):
            os.remove(claim)

    def approximate_depth(self) -> int:
        return sum(1 for n in os.listdir(self.queue_dir)
                   if n.endswith(".msg"))


class SqsQueueClient:
    """Real SQS connector (boto3), same receive/delete protocol.

    Maps 1:1 onto the public SQS API the reference uses: long-poll
    ``receive_message`` with MaxNumberOfMessages / WaitTimeSeconds /
    VisibilityTimeout, ``delete_message`` on success.  Construction
    raises when boto3 is absent — callers pick the seam via
    :data:`HAS_BOTO3`.
    """

    def __init__(self, queue_url: str, region: str | None = None,
                 visibility_timeout: int = 300):
        if not HAS_BOTO3:
            raise NotImplementedError(
                "SqsQueueClient needs boto3; use FileQueueClient for "
                "local/test queues"
            )
        import boto3

        self._sqs = boto3.client("sqs", region_name=region)
        self.queue_url = queue_url
        self.visibility_timeout = visibility_timeout

    def receive(self, max_messages: int = 1,
                wait_seconds: float = 20.0) -> list[QueueMessage]:
        resp = self._sqs.receive_message(
            QueueUrl=self.queue_url,
            MaxNumberOfMessages=max_messages,
            WaitTimeSeconds=int(wait_seconds),
            VisibilityTimeout=self.visibility_timeout,
        )
        return [
            QueueMessage(m["MessageId"], m["Body"], m["ReceiptHandle"])
            for m in resp.get("Messages", [])
        ]

    def delete(self, receipt_handle: str) -> None:
        self._sqs.delete_message(QueueUrl=self.queue_url,
                                 ReceiptHandle=receipt_handle)


def _one_line(body: str) -> str:
    """Collapse a message body to exactly one manifest line.

    SQS bodies may legally contain newlines (e.g. pretty-printed JSON);
    the inbox manifest is line-framed, so an embedded newline would split
    one message into several and corrupt poison-line accounting.  Valid
    JSON is re-serialized compact (semantics preserved); anything else —
    poison by definition downstream — gets its newlines replaced so it
    still lands as ONE (still-unparseable, still-counted-once) line.
    """
    body = body.rstrip("\n")
    if "\n" not in body and "\r" not in body:
        return body
    try:
        return json.dumps(json.loads(body), separators=(",", ":"))
    except ValueError:
        return body.replace("\r", " ").replace("\n", " ")


class QueueBridge:
    """Drain a queue into the streaming consumer's file inbox.

    One manifest file per drained batch (one JSON message per line),
    written atomically (tmp + rename) so the file stream never observes a
    partial file; each message is deleted only after the rename — the
    durable-handoff point.  Poison filtering stays downstream in
    ``parse_job_messages`` (bad JSON must land in the inbox and be
    *counted* there, preserving the reference's poison-isolation tests).
    """

    def __init__(self, client, inbox_dir: str):
        self.client = client
        self.inbox_dir = inbox_dir
        os.makedirs(inbox_dir, exist_ok=True)
        self._seq = 0

    def drain_once(self, max_messages: int = 10,
                   wait_seconds: float = 0.0) -> int:
        """Receive up to max_messages, persist them, ack them. Returns the
        number of messages bridged."""
        msgs = self.client.receive(max_messages=max_messages,
                                   wait_seconds=wait_seconds)
        if not msgs:
            return 0
        self._seq += 1
        name = f"bridge-{int(time.time() * 1000):013d}-{self._seq:06d}.json"
        path = os.path.join(self.inbox_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for m in msgs:
                f.write(_one_line(m.body) + "\n")
        os.rename(tmp, path)
        for m in msgs:  # durable -> ack (delete-on-success, moved one hop)
            self.client.delete(m.receipt_handle)
        return len(msgs)

    def run(self, poll_interval: float = 20.0, max_drains: int | None = None,
            max_messages: int = 10) -> int:
        """The reference's infinite long-poll loop (bounded for tests)."""
        total = 0
        drains = 0
        while max_drains is None or drains < max_drains:
            n = self.drain_once(max_messages=max_messages,
                                wait_seconds=poll_interval)
            total += n
            drains += 1
            if n == 0 and max_drains is None:
                time.sleep(poll_interval)
        return total


def job_message(job_id: int, s3_key: str) -> str:
    """The reference's message body shape ({job_id, s3_key})."""
    return json.dumps({"job_id": job_id, "s3_key": s3_key})
