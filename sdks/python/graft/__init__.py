"""
Graft Python SDK
================

A thin, dependency-free Python client for a running Graft query server
(``graft.server.Server`` — start one with ``sbt 'runMain graft.Run --serve'``
or in-process from the JVM). It mirrors the compile + run surface of the
reference Wvlet Python SDK (sdks/python/wvlet: ``compile()`` +
``WvletCompiler``), re-expressed over Graft's HTTP API instead of a bundled
native library: compilation happens on the server (the Spark engine), the
client stays pure stdlib.

Quick start
-----------
    >>> from graft import compile, GraftClient
    >>> sql = compile("from users select name, age where age > 18")
    >>> print(sql)
    SELECT name, age FROM users WHERE age > 18

    >>> client = GraftClient("http://127.0.0.1:9876")
    >>> result = client.run("from lineitem group by l_returnflag agg n = _.count")
    >>> result.schema
    [('l_returnflag', 'string'), ('n', 'long')]
    >>> result.rows
    [['A', 1478], ['N', 3043], ['R', 1480]]

Endpoint resolution: explicit argument, else the ``GRAFT_ENDPOINT``
environment variable, else ``http://127.0.0.1:9876``.
"""

from .client import (
    CompilationError,
    GraftClient,
    QueryResult,
    RpcError,
    compile,
)

__all__ = [
    "CompilationError",
    "GraftClient",
    "QueryResult",
    "RpcError",
    "compile",
]

__version__ = "0.9.0"
