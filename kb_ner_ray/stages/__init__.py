"""map_batches stage implementations.

Stateless stages are plain functions (Arrow table in / Arrow table out);
stateful stages are callable classes run as actor pools
(``map_batches(Cls, concurrency=N, batch_size=B)``), with all heavy state
built once in ``__init__`` from ``ray.put`` broadcasts.
"""
