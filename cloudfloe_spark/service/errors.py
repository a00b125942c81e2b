"""Service-layer error type.

The reference raises FastAPI ``HTTPException(status_code, detail)``
(`backend/main.py:74,82,...`). This port keeps the same (status, detail)
shape in a framework-free exception so the engine layer has no web-framework
dependency; the API layer maps it onto whatever HTTP stack is present.
"""

from __future__ import annotations


class CloudfloeError(Exception):
    """An error with an HTTP status code and a user-facing detail string."""

    def __init__(self, status_code: int, detail: str) -> None:
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


def bad_request(detail: str) -> CloudfloeError:
    return CloudfloeError(400, detail)
