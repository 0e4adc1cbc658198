from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from batchprocessingetl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


def _maybe_enable_postgres() -> None:
    """When a PostgreSQL server is reachable on the standard port and
    the stock public JDBC driver jar exists on the box, expose the jar
    to the session factory (must happen BEFORE the JVM starts) so the
    Postgres-dialect JDBC tests can run; they capability-gate on the
    same probe and skip cleanly anywhere else."""
    import glob
    import os
    import socket

    if os.environ.get("SPARK_GRAFT_EXTRA_JARS"):
        return
    jars = sorted(
        glob.glob("/usr/share/java/postgresql*.jar")
        # the stock org.postgresql:postgresql driver artifact, present
        # on this machine alongside the reference deployment
        + glob.glob("/root/reference/postgresql-*.jar")
    )
    if not jars:
        return
    try:
        with socket.create_connection(("127.0.0.1", 5432), timeout=1):
            pass
    except OSError:
        return
    os.environ["SPARK_GRAFT_EXTRA_JARS"] = jars[0]


_maybe_enable_postgres()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)
