"""Job-completion notifications — the engine counterpart of the
reference's cron wrappers (``run_technical.sh:17-34``: run the job,
grep key metrics out of its logs, POST a one-line ✅/❌ status to a
webhook). Two deliberate differences:

- Runners report metrics DIRECTLY (row counts returned by the job
  functions) instead of re-grepping their own logs — the shell wrapper
  scraped logs only because its jobs were opaque processes.
- The webhook URL is configuration (``--webhook-url`` flag or the
  ``PIPELINE_WEBHOOK_URL`` env var), never a constant in the source;
  with no URL configured the report still prints to stdout, so the CLI
  behaves identically in dev and under cron.

Stdlib ``urllib`` only — no external HTTP dependency; a webhook POST
is one JSON object (``{"content": "..."}``, the same shape the
reference curls). Failures to DELIVER a notification never fail the
job: the pipeline's exit status reflects pipeline work, and the
delivery error is printed instead.
"""

from __future__ import annotations

import datetime as dt
import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field


@dataclass
class JobReport:
    """Outcome of one pipeline job run."""

    job: str
    ok: bool
    duration_sec: float
    metrics: dict = field(default_factory=dict)
    error: str | None = None
    finished_at: str = ""          # ISO local time; stamped if empty

    def __post_init__(self) -> None:
        if not self.finished_at:
            self.finished_at = dt.datetime.now().strftime("%Y-%m-%d %H:%M:%S")

    def message(self) -> str:
        """One-line status, the reference's Discord message shape."""
        parts = [f"{'✅' if self.ok else '❌'} **{self.job} "
                 f"{'Success' if self.ok else 'Failed'}** ({self.finished_at})"]
        parts += [f"{k}: {v}" for k, v in self.metrics.items()]
        parts.append(f"duration: {self.duration_sec:.1f}s")
        if self.error:
            parts.append(f"error: {self.error}")
        parts.append("Status: " + ("Completed" if self.ok else "Check logs"))
        return " | ".join(parts)


def post_webhook(url: str, content: str, *, timeout: float = 10.0,
                 retries: int = 2, backoff_sec: float = 1.0) -> bool:
    """POST ``{"content": content}`` to a webhook URL. Returns delivery
    success; never raises (notification failure must not fail the job).
    Retries transient errors with linear backoff."""
    body = json.dumps({"content": content}).encode("utf-8")
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"})
    for attempt in range(retries + 1):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                if 200 <= resp.status < 300:
                    return True
        except (urllib.error.URLError, OSError, ValueError):
            pass
        if attempt < retries:
            time.sleep(backoff_sec * (attempt + 1))
    return False


def notify(report: JobReport, webhook_url: str | None = None) -> bool:
    """Print the report line; deliver it to the webhook when one is
    configured (argument wins over ``$PIPELINE_WEBHOOK_URL``). Returns
    True when no delivery was needed or delivery succeeded."""
    import os

    msg = report.message()
    print(msg)
    url = webhook_url or os.environ.get("PIPELINE_WEBHOOK_URL")
    if not url:
        return True
    ok = post_webhook(url, msg)
    if not ok:
        print(f"notify: webhook delivery failed for job {report.job!r}")
    return ok


class timed_job:
    """Context manager producing a JobReport around a job body:

        with timed_job("technical") as t:
            t.metrics["rows"] = run_technical_upload(...)
        notify(t.report, url)

    An exception marks the report failed (and propagates); metrics
    recorded before the failure are kept in the report.
    """

    def __init__(self, job: str):
        self.job = job
        self.metrics: dict = {}
        self.report: JobReport | None = None

    def __enter__(self) -> "timed_job":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        self.report = JobReport(
            job=self.job, ok=exc is None,
            duration_sec=time.perf_counter() - self._t0,
            metrics=self.metrics,
            error=f"{exc_type.__name__}: {exc}"[:300] if exc else None)
        return False                       # never swallow the exception
