"""Completion notifications (reference scripts/step_functions.json:13-23):
the reference's orchestration publishes an SNS message ``{"messagekey1":
"success"}`` after the KPI job finishes. The idiomatic Spark mapping is a
``StreamingQueryListener`` — driver-side control plane, no data-path
cost — publishing a JSON notification document per query lifecycle event
to a topic-like directory.

``notify_completion`` is the transport (atomic tmp+rename file publish
standing in for ``sns:Publish``); ``CompletionNotifier`` wires it to
streaming query termination; batch jobs call it directly.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["notify_completion", "CompletionNotifier", "attach_notifier"]


def notify_completion(
    topic_dir: str,
    job_name: str,
    status: str,
    error: str | None = None,
    extra: dict | None = None,
) -> str:
    """Publish one notification document to ``topic_dir`` (the SNS-topic
    analogue). Atomic tmp+rename so a consumer never reads a torn file.
    Returns the published path."""
    os.makedirs(topic_dir, exist_ok=True)
    doc = {
        "job_name": job_name,
        "status": status,
        "message": {"messagekey1": status},  # reference payload shape
        "published_at": int(time.time()),
    }
    if error is not None:
        doc["error"] = error
    if extra:
        doc.update(extra)
    final = os.path.join(topic_dir, f"{int(time.time())}-{uuid.uuid4().hex}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
    os.replace(tmp, final)
    return final


class CompletionNotifier(StreamingQueryListener):
    """Publishes a notification when a streaming query terminates:
    ``success`` on clean stop, ``failure`` (with the exception text) on
    error — the streaming analogue of the reference's post-job SNS
    publish. Progress events are folded into a per-run input-row count
    reported in the final document."""

    def __init__(self, topic_dir: str) -> None:
        self.topic_dir = topic_dir
        self._rows: dict[str, int] = {}
        self._names: dict[str, str] = {}

    def onQueryStarted(self, event) -> None:
        self._rows[str(event.runId)] = 0
        self._names[str(event.runId)] = event.name or str(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._rows[str(p.runId)] = self._rows.get(str(p.runId), 0) + int(
            p.numInputRows or 0
        )

    def onQueryIdle(self, event) -> None:  # control-plane no-op
        return

    def onQueryTerminated(self, event) -> None:
        run_id = str(event.runId)
        status = "failure" if event.exception else "success"
        notify_completion(
            self.topic_dir,
            job_name=self._names.pop(run_id, run_id),
            status=status,
            error=str(event.exception) if event.exception else None,
            extra={"run_id": run_id, "input_rows": self._rows.pop(run_id, 0)},
        )


def attach_notifier(spark, topic_dir: str) -> CompletionNotifier:
    """Register a ``CompletionNotifier`` on the session; caller detaches
    with ``spark.streams.removeListener``."""
    listener = CompletionNotifier(topic_dir)
    spark.streams.addListener(listener)
    return listener
