"""Context graph for shallow-fusion keyword biasing.

Parity target: `wenet/utils/context_graph.py` — an Aho-Corasick-style token
trie over biasing phrases: extending a partial match adds ``context_score``
per token; falling off a partial match backtracks the accumulated boost via
fail links; completing a phrase keeps the boost.  Used by the CTC prefix
beam search (`wenet/transformer/search.py:124-248`).
"""
from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple


class ContextState:
    __slots__ = ("token", "score", "total_score", "is_end", "next",
                 "fail", "output")

    def __init__(self, token: int = -1, score: float = 0.0,
                 total_score: float = 0.0, is_end: bool = False):
        self.token = token
        self.score = score              # boost gained entering this node
        self.total_score = total_score  # accumulated boost from root
        self.is_end = is_end
        self.next: Dict[int, "ContextState"] = {}
        self.fail: Optional["ContextState"] = None
        self.output: Optional["ContextState"] = None


class ContextGraph:
    def __init__(self, phrases: List[List[int]],
                 context_score: float = 3.0):
        """phrases: token-id sequences to bias toward."""
        self.context_score = context_score
        self.root = ContextState()
        self.root.fail = self.root
        for phrase in phrases:
            node = self.root
            for i, tok in enumerate(phrase):
                if tok not in node.next:
                    nxt = ContextState(
                        token=tok, score=context_score,
                        total_score=node.total_score + context_score,
                        is_end=(i == len(phrase) - 1),
                    )
                    node.next[tok] = nxt
                else:
                    if i == len(phrase) - 1:
                        node.next[tok].is_end = True
                node = node.next[tok]
        self._build_fail_links()

    def _build_fail_links(self):
        q = deque()
        for node in self.root.next.values():
            node.fail = self.root
            q.append(node)
        while q:
            cur = q.popleft()
            for tok, nxt in cur.next.items():
                f = cur.fail
                while tok not in f.next and f is not self.root:
                    f = f.fail
                nxt.fail = f.next.get(tok, self.root)
                if nxt.fail is nxt:
                    nxt.fail = self.root
                out = nxt.fail
                nxt.output = out if out.is_end else out.output
                q.append(nxt)

    def forward_one_step(self, state: ContextState,
                         token: int) -> Tuple[float, ContextState]:
        """Advance by one token; returns (score_delta, new_state).

        score_delta includes backtracking penalties when a partial match
        dies (mirrors `context_graph.py` semantics).
        """
        node = state
        while token not in node.next and node is not self.root:
            node = node.fail
        if token in node.next:
            nxt = node.next[token]
            delta = nxt.total_score - state.total_score
            if nxt.is_end and not nxt.next:
                # completed phrase with no continuation: reset to root,
                # keep the boost
                return delta, self.root
            return delta, nxt
        # no transition: lose the partial-match boost
        return -state.total_score, self.root

    def finalize(self, state: ContextState) -> float:
        """Score adjustment when decoding ends mid-phrase (drop partial
        boost unless we are at a completed phrase)."""
        if state.is_end:
            return 0.0
        return -state.total_score
