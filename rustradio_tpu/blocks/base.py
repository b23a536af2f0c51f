"""Block protocol.

The reference's Block trait is ``work(&mut self) -> BlockRet`` driven by a
dynamic scheduler (src/block.rs:112-126).  Here a block is a *declarative*
node: a pure function over whole streams (offline mode) plus an optional
chunk form with carried state (streaming mode).  ``BlockRet`` disappears —
scheduling is static.
"""

from __future__ import annotations

from ..streams import Tag


class Block:
    """Base graph node.

    Class attributes:

    * ``n_in`` / ``n_out`` — port counts.
    * ``domain`` — "device" (fused into jit segments) or "host".
    * ``interp`` / ``deci`` — nominal rate ratio, used for tag rescaling.
    """

    n_in = 1
    n_out = 1
    domain = "device"
    interp = 1
    deci = 1
    # Kernel flavor for segment fusion: "conv" (lowers to a
    # HIGHEST-precision XLA conv) or "pallas" (contains a pallas_call).
    # On TPU one XLA program holding BOTH compiles pathologically slowly
    # (minutes vs seconds — doc/performance.md), so the graph fuser never
    # puts conflicting flavors in one segment.  None fuses with either.
    compile_group: str | None = None
    # The runners wrap a device block's apply/apply_chunk in jax.jit.
    # Set jit_chunk = False when the block's logic is not jax-traceable
    # (Python-value-dependent control flow or host numpy inside) — the
    # block then runs eagerly and must jit any complex-dtype math itself.
    jit_chunk = True

    def name(self) -> str:
        return type(self).__name__

    # ---- offline ----
    def apply(self, *xs):
        """Whole-stream pure function. Returns one array or a tuple."""
        raise NotImplementedError

    # ---- streaming ----
    def init_state(self):
        """Carried state pytree; None for stateless blocks."""
        return None

    def apply_chunk(self, state, *xs):
        """Chunk form: (state', outputs). Default: stateless == offline.

        Must produce, over concatenated chunks, exactly the same stream as
        ``apply`` over the concatenated input.
        """
        return state, self.apply(*xs)

    # ---- tags ----
    def process_tags(self, in_tags: list[list[Tag]], out_lens) -> list[list[Tag]]:
        """Map input-port tag lists to output-port tag lists.

        Default: pass port-0 tags to every output, positions rescaled by
        interp/deci and clipped to the output length.
        """
        src = in_tags[0] if in_tags else []
        out = []
        for n in out_lens:
            out.append(
                [
                    Tag(t.pos * self.interp // self.deci, t.key, t.val)
                    for t in src
                    if t.pos * self.interp // self.deci < n
                ]
            )
        return out


class SourceBlock(Block):
    """A block with no inputs; produces n samples from a stream offset."""

    n_in = 0

    def total_len(self):
        """Total stream length for offline mode, or None if unbounded."""
        return None

    def emit(self, offset: int, n: int):
        """Produce samples [offset, offset+n) of the stream."""
        raise NotImplementedError

    def emit_tags(self, offset: int, n: int) -> list[Tag]:
        return []

    # Optional batch protocol for the compiled streaming runner
    # (Graph.run_stream(scan_chunks=B)): a source may define
    #   emit_batch(offset, chunk_size, nb) -> stacked (nb, chunk) array
    # to produce a whole batch in ONE call (device-resident sources avoid
    # nb per-chunk dispatch round trips).  Symmetrically, an n_out == 0
    # device-domain block may define accept_batch(*stacked) to consume
    # stacked outputs in one call (it then owns any per-chunk handling).

    def apply(self):
        total = self.total_len()
        if total is None:
            raise ValueError(
                f"{self.name()} is unbounded; offline mode needs Head or a "
                "finite source"
            )
        return self.emit(0, total)
