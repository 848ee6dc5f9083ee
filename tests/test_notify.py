"""Job-status notifications (notify.py) — the reference's run_*.sh
wrapper behavior: one-line ✅/❌ report with key metrics, delivered to a
webhook when configured, stdout-only otherwise, and NEVER able to fail
the job it reports on (delivery errors are printed, not raised)."""

import http.server
import json
import threading

import pytest

from tradingview_data_pipeline_spark.notify import (
    JobReport, notify, post_webhook, timed_job,
)


@pytest.fixture
def webhook_server():
    """Local HTTP server capturing webhook POST bodies."""
    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(204)
            self.end_headers()

        def log_message(self, *a):          # keep pytest output clean
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/hook", received
    srv.shutdown()


def test_report_message_shape_success_and_failure():
    ok = JobReport("Technical Pipeline", True, 12.34,
                   metrics={"stock_data_rows": 1384},
                   finished_at="2026-08-13 12:30:00")
    assert ok.message() == (
        "✅ **Technical Pipeline Success** (2026-08-13 12:30:00) | "
        "stock_data_rows: 1384 | duration: 12.3s | Status: Completed")
    bad = JobReport("Composite Score", False, 1.0,
                    error="RuntimeError: boom",
                    finished_at="2026-08-13 12:30:00")
    assert bad.message().startswith("❌ **Composite Score Failed**")
    assert "error: RuntimeError: boom" in bad.message()
    assert bad.message().endswith("Status: Check logs")


def test_notify_delivers_to_webhook(webhook_server, capsys):
    url, received = webhook_server
    rep = JobReport("Technical Pipeline", True, 2.0,
                    metrics={"rows": 7})
    assert notify(rep, url)
    assert len(received) == 1
    assert received[0]["content"] == rep.message()
    assert rep.message() in capsys.readouterr().out   # always printed


def test_notify_without_url_prints_only(monkeypatch, capsys):
    monkeypatch.delenv("PIPELINE_WEBHOOK_URL", raising=False)
    rep = JobReport("Fundamental Pipeline", True, 0.5)
    assert notify(rep)                  # nothing to deliver -> True
    assert "Fundamental Pipeline Success" in capsys.readouterr().out


def test_notify_env_var_fallback(webhook_server, monkeypatch):
    url, received = webhook_server
    monkeypatch.setenv("PIPELINE_WEBHOOK_URL", url)
    assert notify(JobReport("Technical Pipeline", True, 1.0))
    assert len(received) == 1


def test_delivery_failure_never_raises(capsys):
    # unroutable port; retries exhausted -> False, job unaffected
    rep = JobReport("Technical Pipeline", True, 1.0)
    assert post_webhook("http://127.0.0.1:9/hook", "x",
                        timeout=0.2, retries=1, backoff_sec=0.0) is False
    assert notify(rep, "http://127.0.0.1:9/hook") is False
    assert "delivery failed" in capsys.readouterr().out


def test_timed_job_success_and_failure_reports():
    with timed_job("J") as t:
        t.metrics["rows"] = 3
    assert t.report.ok and t.report.metrics == {"rows": 3}
    assert t.report.duration_sec >= 0

    with pytest.raises(ValueError):
        with timed_job("J2") as t2:
            t2.metrics["partial"] = 1
            raise ValueError("bad batch")
    assert not t2.report.ok
    assert t2.report.error == "ValueError: bad batch"
    assert t2.report.metrics == {"partial": 1}   # pre-failure metrics kept
