"""HiveServer2-compatible JDBC/ODBC endpoint (entry point B).

The reference serves BI tooling over the HiveServer2 Thrift protocol
(be/src/service/impala-hs2-server.cc:716 — ExecuteStatement /
FetchResults over TCLIService); Spark ships the same protocol as
``HiveThriftServer2``, which can be attached to a live ``SparkSession``
so JDBC clients see the session's catalog (temp views included when
``spark.sql.hive.thriftServer.singleSession=true``).

This module is the thin adapter: :func:`start_hs2` binds the server to
the session, and any ``jdbc:hive2://host:port`` client — beeline, a BI
tool, the Impala shell's HS2 mode — can run queries against the engine.
On a cluster the server runs on the driver and fans work out exactly
like programmatic queries; result fetch is the PlanRootSink path.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import SparkSession


def start_hs2(spark: SparkSession, port: int = 10000, wait_s: float = 30.0) -> int:
    """Start an in-process HiveThriftServer2 bound to ``spark``'s context.

    Returns the bound port once it accepts TCP connections.  The server
    lives until the JVM exits (Spark exposes no stop API on the
    companion object); tests therefore run it in a dedicated subprocess.
    """
    jvm = spark.sparkContext._jvm
    # HiveThriftServer2 reads the port from hive-site/system properties,
    # not SparkConf — set it just-in-time before start.
    jvm.java.lang.System.setProperty("hive.server2.thrift.port", str(port))
    jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    deadline = time.monotonic() + wait_s
    while time.monotonic() < deadline:
        try:
            socket.create_connection(("localhost", port), timeout=1).close()
            return port
        except OSError:
            time.sleep(0.25)
    raise TimeoutError(f"HiveThriftServer2 did not open port {port} in {wait_s}s")
