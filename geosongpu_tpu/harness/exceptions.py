"""Tagged check-failure exception (parity:
/root/reference/src/tcn/ci/utils/ci_exception.py:1-5)."""


class CICheckException(Exception):
    """Raised when a task's check() gate fails."""
