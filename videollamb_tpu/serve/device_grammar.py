"""Device-side constrained decoding: grammar tables in HBM.

The host-mask path (serve/constrained.build_constraint_masks) costs one
dispatch+readback per token plus a (B, V) mask transfer per step —
measured 85 tok/s vs 609 unconstrained at 7B int8 B=8 through the tunnel
(benchmarks/constrained_bench.py). The TPU-native fix: upload each
visited grammar state's per-token closing-cost row and transition row to
an HBM pool ONCE, and let the engines' k-step greedy scan gather rows by
state slot — constrained greedy rows never leave the device loop.

Per scan step, entirely on device:
  mask  = pool_costs[slot] <= remaining - 1     (budget forced closing)
  token = argmax(where(mask, logits, -inf))
  sid   = pool_next[slot, token]                (machine transition)
  slot  = sid2slot[sid]                         (lazy upload mapping)

Lazy-state handling: transitions can land on a state the host has not
expanded/uploaded yet. The scan then FREEZES the row at that step — the
frozen token is still valid (it was chosen under a correct mask); only
the steps after it are garbage. The scan reports the freeze step and the
row's logits right after its last valid token, so the engine keeps the
valid prefix, rewinds the row's cache length over the garbage (dense
cache writes land at ``length``, so rewinding the counter makes the next
steps overwrite them), restores the logits, and continues next sync —
by which time the host-side ``advance()`` has interned the new state and
``DeviceTable.slot`` uploads it. Warm tables (shared per tokenizer
across requests) freeze only on first visits.

Sentinels in ``pool_next``: ``DEAD`` (-2) sends the row to the reserved
FREE slot 0 (everything allowed, self-loop) — used after EOS and for
unconstrained rows; ``-1``/unmapped sids mean "not uploaded" -> freeze.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

BIG_COST = 1 << 20
DEAD = -2
# Budget stand-in for unconstrained rows: large, but small enough that
# remaining - 1 never wraps int32 inside a scan.
FREE_REMAINING = 1 << 24


class DeviceTable:
    """HBM pool of per-state (costs, next-sid) rows for ONE GrammarTable.

    Slot 0 is reserved FREE: costs all 0 (everything allowed, EOS
    included), next all DEAD (self-loop) — unconstrained rows and rows
    whose constraint finished mid-scan ride it.
    """

    def __init__(self, table, vocab_size: int, cap: int = 192,
                 sid_cap: int = 8192):
        self.table = table
        self.V = int(vocab_size)
        self.cap = cap
        self.sid_cap = sid_cap
        self.costs = jnp.full((cap, self.V), BIG_COST, jnp.int32).at[0].set(0)
        self.next_sid = jnp.full((cap, self.V), DEAD, jnp.int32)
        self.sid2slot = jnp.full((sid_cap,), -1, jnp.int32)
        self._slot_of = {}
        self._n = 1

    def slot(self, sid: int) -> Optional[int]:
        """Slot for state ``sid``, uploading its rows on first use.
        None = pool/sid capacity exhausted (caller falls back to the
        host-mask path)."""
        s = self._slot_of.get(sid)
        if s is not None:
            return s
        if self._n >= self.cap or sid >= self.sid_cap:
            return None
        allowed, ends, costs = self.table.expand(sid)
        row_cost = np.full((self.V,), BIG_COST, np.int32)
        row_cost[allowed] = costs
        row_next = np.full((self.V,), DEAD, np.int32)
        row_next[allowed] = ends
        eos = self.table.eos
        if self.table.machine.cost(self.table.state(sid)) == 0:
            row_cost[eos] = 0
        row_next[eos] = DEAD  # EOS finishes the row host-side; device: FREE
        s = self._n
        self._n += 1
        self._slot_of[sid] = s
        self.costs = self.costs.at[s].set(jnp.asarray(row_cost))
        self.next_sid = self.next_sid.at[s].set(jnp.asarray(row_next))
        self.sid2slot = self.sid2slot.at[sid].set(s)
        return s


class CombinedDeviceTable:
    """Several DeviceTables concatenated into ONE global HBM pool, so a
    batch mixing constraint tables (a JSON grammar in one slot, a choice
    trie in another) stays in the k-step device scan (VERDICT r4 #5 —
    mixed-table batches previously fell back to per-step host masks, the
    85-180 tok/s regime the device scan was built to kill).

    The trick is pure rebasing, so the scans run UNCHANGED: table i's
    rows move to global slots [slot_base[i], slot_base[i]+cap_i) and its
    states to global sids [sid_base[i], sid_base[i]+sid_cap_i); its
    ``next_sid`` entries are shifted by sid_base[i] (negative sentinels
    — DEAD and any freeze marker — preserved), and its ``sid2slot`` by
    slot_base[i] (-1 "not uploaded" preserved). Global slot 0 is table
    0's reserved FREE row, which is table-independent by construction
    (costs all 0, next all DEAD), so unconstrained rows and finished
    constraints ride it exactly as before. A row's table never changes
    mid-request, so every transition a row can take stays inside its own
    table's global range.

    Rebuilds (a handful of jnp.where + concatenate dispatches over the
    pools) happen only when some member uploaded a new state since the
    last sync (`_versions` check) — steady-state syncs reuse the cached
    combined arrays.
    """

    def __init__(self, tables):
        self.tables = tuple(tables)
        self.slot_base = np.cumsum([0] + [t.cap for t in self.tables])[:-1]
        self.sid_base = np.cumsum(
            [0] + [t.sid_cap for t in self.tables])[:-1]
        self._versions = None
        self.refresh()

    def refresh(self) -> None:
        versions = tuple(t._n for t in self.tables)
        if versions == self._versions:
            return
        self._versions = versions
        nxt, s2s = [], []
        for t, sb, pb in zip(self.tables, self.sid_base, self.slot_base):
            nxt.append(jnp.where(t.next_sid < 0, t.next_sid,
                                 t.next_sid + int(sb)))
            s2s.append(jnp.where(t.sid2slot < 0, t.sid2slot,
                                 t.sid2slot + int(pb)))
        self.costs = jnp.concatenate([t.costs for t in self.tables], 0)
        self.next_sid = jnp.concatenate(nxt, 0)
        self.sid2slot = jnp.concatenate(s2s, 0)


def combined_table_for(device_tables) -> CombinedDeviceTable:
    """One CombinedDeviceTable per ordered tuple of member DeviceTables,
    cached on the first member (mirrors device_table_for's caching; the
    cache entry keeps the members alive, so the id-tuple key is stable).
    Call AFTER uploading this sync's states — refresh() folds them in."""
    key = tuple(id(t) for t in device_tables)
    cache = getattr(device_tables[0], "_combined_cache", None)
    if cache is None:
        cache = device_tables[0]._combined_cache = {}
    ct = cache.get(key)
    if ct is None:
        ct = cache[key] = CombinedDeviceTable(device_tables)
    else:
        ct.refresh()
    return ct


def device_table_for(table, vocab_size: int) -> DeviceTable:
    """One DeviceTable per grammar/choice table, cached on the table
    (shared by every request/engine using that tokenizer+grammar).

    Tables exposing ``preferred_cap``/``preferred_sid_cap`` (choice tries
    — a handful of states) get a right-sized pool instead of the 192-row
    grammar default, and ``prewarm_sids`` uploads every state at creation
    so their scans never freeze."""
    dt = getattr(table, "_device_table", None)
    if dt is None or dt.V != int(vocab_size):
        dt = DeviceTable(
            table, vocab_size,
            cap=getattr(table, "preferred_cap", 192),
            sid_cap=getattr(table, "preferred_sid_cap", 8192),
        )
        for sid in getattr(table, "prewarm_sids", ()):
            dt.slot(sid)
        table._device_table = dt
    return dt
