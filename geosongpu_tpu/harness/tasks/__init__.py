"""Task classes self-register on import (parity:
/root/reference/src/tcn/ci/pipeline/__init__.py:1-10)."""
from . import aquaplanet  # noqa: F401
from . import baroclinic  # noqa: F401
from . import climatology  # noqa: F401
from . import heartbeat  # noqa: F401
from . import held_suarez  # noqa: F401
from . import maintenance  # noqa: F401
from . import physics_standalone  # noqa: F401
from . import scaling  # noqa: F401
