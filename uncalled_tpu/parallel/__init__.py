"""Multi-chip execution layouts (docs/DESIGN.md §multi-chip).

- data-parallel replicated index: plain jit + NamedSharding (the default;
  __graft_entry__.dryrun_multichip).
- sharded FM-index for large references: :mod:`.sharded`.
"""

from .sharded import ShardedMapEngine, ShardedPooledEngine

__all__ = ["ShardedMapEngine", "ShardedPooledEngine"]
