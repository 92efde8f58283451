from __future__ import annotations

import pytest

from colcrush.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("colcrush-tests", cores=8, driver_memory="8g")
    yield s
    s.stop()
