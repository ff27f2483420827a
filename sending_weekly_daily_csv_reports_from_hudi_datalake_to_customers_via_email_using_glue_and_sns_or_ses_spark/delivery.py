"""Delivery layer (SURVEY.md §2.2 K3/K4): presigned URL + email.

The reference couples these to boto3/SES (template.py:126-156, 392-434).
Here they are interfaces with local test doubles — the engine core
never imports AWS SDKs; a production adapter would subclass these with
boto3 calls (kept out of this repo's dependency surface on purpose).
"""

from __future__ import annotations

import html
from dataclasses import dataclass


class Presigner:
    """K3 (template.py:152-156, 463-467): time-limited download URL."""

    def presigned_url(self, path: str, expires_in: int = 3600) -> str:
        # local double: file URI with the TTL recorded as a query param
        return f"file://{path}?expires_in={expires_in}"


@dataclass
class EmailMessage:
    to: list[str]
    subject: str
    html_body: str


class EmailSender:
    """K4 (template.py:392-434): delivery transport. The test double
    records messages instead of sending."""

    def __init__(self) -> None:
        self.outbox: list[EmailMessage] = []

    def send(self, msg: EmailMessage) -> None:
        self.outbox.append(msg)


def render_download_email(url: str, project_name: str = "Reports") -> str:
    """K4 template (template.py:331-389): minimal HTML body with the
    download link. Plain str.format, same as the reference."""
    safe = html.escape(url, quote=True)
    return (
        "<html><body>"
        f"<h3>{html.escape(project_name)}</h3>"
        "<p>Your report is ready.</p>"
        f'<p><a href="{safe}">Download report</a></p>'
        "</body></html>"
    )


def parse_recipients(recipients: str | list[str]) -> list[str]:
    """The reference documents a comma-separated recipient string
    (template.py:402); accept that form OR an explicit list, trimming
    blanks either way."""
    if isinstance(recipients, str):
        recipients = recipients.split(",")
    return [r.strip() for r in recipients if r and r.strip()]


def deliver_report(
    path: str,
    recipients: str | list[str],
    presigner: Presigner | None = None,
    sender: EmailSender | None = None,
    expires_in: int = 86400,
    subject: str = "Your scheduled report",
) -> EmailMessage:
    """The K2→K3→K4 tail of the pipeline (template.py:505-516)."""
    presigner = presigner or Presigner()
    sender = sender or EmailSender()
    url = presigner.presigned_url(path, expires_in=expires_in)
    msg = EmailMessage(
        to=parse_recipients(recipients),
        subject=subject,
        html_body=render_download_email(url),
    )
    sender.send(msg)
    return msg
