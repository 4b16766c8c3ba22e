"""Programmatic DSL validator.

The reference validates generated DSLs by prompting an LLM with a 976-line
rule list (reference: agent/prompt/dsl_validation_node_prompt.txt:10-19,
agent/dsl_agent.py:303-371). Here the same contract is enforced as code:
structural rules, graph reachability/termination, predicate and branch
compilability, and engine-semantics warnings. Issues carry a severity so a
generation pipeline can auto-repair or reject.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from game_engine_tpu.gamespec import conditions as C
from game_engine_tpu.gamespec.compile import compile_game
from game_engine_tpu.gamespec.expr import PredicateError, parse_predicate
from game_engine_tpu.gamespec.parser import parse_game_spec
from game_engine_tpu.gamespec.schema import CompletionType, GameSpec

ERROR = "error"
WARNING = "warning"


@dataclasses.dataclass(frozen=True)
class Issue:
    severity: str
    where: str
    message: str

    def __str__(self):
        return f"[{self.severity}] {self.where}: {self.message}"


def validate_doc(doc: Any, name: str = "game") -> tuple[list[Issue], GameSpec | None]:
    issues: list[Issue] = []
    if not isinstance(doc, dict):
        return [Issue(ERROR, "root", "document is not a mapping")], None
    for key in ("declaration", "phases"):
        if key not in doc:
            issues.append(Issue(ERROR, "root", f"missing root key {key!r}"))
    if any(i.severity == ERROR for i in issues):
        return issues, None
    try:
        spec = parse_game_spec(doc, name=name)
    except Exception as e:  # noqa: BLE001 — malformed docs must become Issues,
        # not crashes (the generation pipeline auto-repairs or rejects on them)
        return issues + [Issue(ERROR, "parse", f"{type(e).__name__}: {e}")], None
    issues.extend(validate_spec(spec))
    return issues, spec


def validate_spec(spec: GameSpec) -> list[Issue]:
    issues: list[Issue] = []
    decl = spec.declaration

    # -- declaration ---------------------------------------------------------
    if not decl.fields:
        issues.append(Issue(ERROR, "declaration", "player_states has no fields"))
    if decl.min_players < 1:
        issues.append(Issue(ERROR, "declaration", "min_players must be >= 1"))
    if decl.is_multiplayer and decl.min_players < 2:
        issues.append(Issue(WARNING, "declaration", "multiplayer game with min_players < 2"))
    for g in decl.audience_groups:
        try:
            parse_predicate(g.selection_criteria)
        except PredicateError as e:
            issues.append(Issue(ERROR, f"audience_groups.{g.name}", f"bad selection_criteria: {e}"))

    # -- phase structure -------------------------------------------------------
    if 0 not in spec.phases:
        issues.append(Issue(ERROR, "phases", "phase 0 (Game Introduction) is required"))
    terminals = [p for p in spec.phases.values() if p.is_terminal]
    if not terminals:
        issues.append(Issue(ERROR, "phases", "no terminal phase (next_phase: null)"))

    for pid, ph in spec.phases.items():
        where = f"phases.{pid}"
        if not ph.actions:
            issues.append(Issue(WARNING, where, "phase has no actions"))
        elif ph.actions[0].tools[:1] != ("clearCanvas",):
            # first action must clear the canvas (reference:
            # dsl_phases_generation_prompt.txt:100-106)
            issues.append(Issue(WARNING, where, "first action should be clearCanvas"))
        if decl.tools:
            for a in ph.actions:
                for t in a.tools:
                    if t not in decl.tools and t not in ("clearCanvas", "markPlayerDead"):
                        issues.append(
                            Issue(WARNING, where, f"tool {t!r} missing from tools manifest")
                        )
        comp = ph.completion
        if comp.type is CompletionType.PLAYER_ACTION and comp.wait_for is None:
            issues.append(Issue(WARNING, where, "player_action phase without wait_for"))
        if comp.type is CompletionType.PLAYER_ACTION and not comp.target_condition:
            issues.append(
                Issue(ERROR, where, "player_action phase without target_players.condition")
            )
        if comp.target_condition:
            # parse once: syntax errors + undeclared field references
            try:
                from game_engine_tpu.gamespec.expr import collect_atoms

                pred = parse_predicate(comp.target_condition)
                for atom in collect_atoms(pred):
                    if atom.field not in decl.field_names():
                        issues.append(
                            Issue(
                                WARNING,
                                where,
                                f"target condition references undeclared field {atom.field!r}",
                            )
                        )
            except PredicateError as e:
                issues.append(Issue(ERROR, where, f"bad target condition: {e}"))

    # -- graph: reachability + termination ---------------------------------------
    succ: dict[int, list[int]] = {}
    for pid, ph in spec.phases.items():
        outs = []
        if ph.next_id is not None:
            outs.append(ph.next_id)
        outs.extend(b.phase_id for b in ph.branches)
        succ[pid] = outs
    start = spec.start_phase_id
    reach = {start}
    stack = [start]
    while stack:
        cur = stack.pop()
        for nxt in succ.get(cur, []):
            if nxt not in reach:
                reach.add(nxt)
                stack.append(nxt)
    for pid in spec.phases:
        if pid not in reach:
            issues.append(Issue(WARNING, f"phases.{pid}", "unreachable from phase 0"))
    # termination: terminal reachable from every reachable phase
    term_ids = {p.id for p in terminals}
    can_end = set(term_ids)
    changed = True
    while changed:
        changed = False
        for pid, outs in succ.items():
            if pid not in can_end and any(o in can_end for o in outs):
                can_end.add(pid)
                changed = True
    for pid in reach:
        if pid not in can_end and spec.phases[pid] and pid not in term_ids:
            issues.append(Issue(ERROR, f"phases.{pid}", "cannot reach any terminal phase"))

    # -- branch condition compilability -------------------------------------------
    ctx = C.ConditionContext(spec)
    for pid, ph in spec.phases.items():
        for b in ph.branches:
            _, ok = C.compile_branch_condition(b.condition, ctx)
            if not ok:
                issues.append(
                    Issue(
                        WARNING,
                        f"phases.{pid}.next_phase",
                        f"branch condition not recognized (compiles to fallthrough): {b.condition!r}",
                    )
                )

    # -- engine compile smoke --------------------------------------------------------
    try:
        compile_game(spec)
    except Exception as e:  # noqa: BLE001 — anything here is a validator finding
        issues.append(Issue(ERROR, "compile", f"engine compilation failed: {e}"))
    return issues


def errors(issues: list[Issue]) -> list[Issue]:
    return [i for i in issues if i.severity == ERROR]
