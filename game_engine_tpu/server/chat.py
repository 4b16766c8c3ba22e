"""In-game chat: message store, visibility controls, bot responder.

Mirrors the reference chat path: messages are sent as
"Player X in game chat: ..." or "Player X to Bot N: ..." (reference:
src/app/page.tsx:321-351), routed to ChatBotNode which roleplays a bot
reply via addBotChatMessage with visibility controls (reference:
agent/game_agent_v2.py:351-466, src/lib/canvas/types.ts:324-336). Here the
responder is deterministic and state-aware: the addressed (or a pertinent
alive) bot answers from phase context; dead players never speak (reference:
game_agent_v2.py:438-441). Private replies carry target_audience ids.
"""

from __future__ import annotations

import dataclasses
import itertools
import re
import time
from typing import Any, Optional

from game_engine_tpu.gamespec.mechanics import splitmix32

_TO_BOT = re.compile(r"^\s*(?:to\s+bot\s*(\d+)\s*:|@(?:bot\s*)?(\d+)\b)", re.IGNORECASE)


@dataclasses.dataclass
class ChatMessage:
    id: str
    playerId: str
    playerName: str
    message: str
    timestamp: float
    type: str = "message"  # message | system | action | broadcast
    visibility: str = "public"  # public | private | hidden
    target_audience: Optional[list[str]] = None

    def to_json(self) -> dict[str, Any]:
        return dataclasses.asdict(self)


_REPLIES = {
    "greeting": [
        "Hey {sender}! Ready when you are.",
        "Hello {sender} — let's play.",
        "Hi {sender}!",
    ],
    "vote": [
        "I'm still weighing the votes, {sender}.",
        "My vote stays with my read of the discussion.",
        "Let's see how the votes land.",
    ],
    "suspicion": [
        "Interesting theory, {sender} — but what's your evidence?",
        "I'm not the one you should worry about, {sender}.",
        "Accusations need proof, {sender}.",
    ],
    "default": [
        "Noted, {sender}.",
        "Let's focus on the current phase.",
        "We'll see soon enough, {sender}.",
        "Good point — keep talking.",
    ],
}

_KEYWORDS = [
    (re.compile(r"\b(hi|hello|hey)\b", re.IGNORECASE), "greeting"),
    (re.compile(r"\bvote|voting|eliminate\b", re.IGNORECASE), "vote"),
    (re.compile(r"\b(suspect|suspicious|liar|werewolf|assassin|accuse)\b", re.IGNORECASE), "suspicion"),
]


class ChatRoom:
    """Per-room chat log + deterministic bot responder."""

    def __init__(self, room_id: str, seed: int = 0):
        self.room_id = room_id
        self.seed = seed
        self.messages: list[ChatMessage] = []
        self._ids = itertools.count(1)

    def post(self, player_id: int, player_name: str, text: str,
             visibility: str = "public",
             target_audience: Optional[list[str]] = None,
             mtype: str = "message") -> ChatMessage:
        msg = ChatMessage(
            id=f"{self.room_id}-{next(self._ids)}",
            playerId=str(player_id),
            playerName=player_name,
            message=text,
            timestamp=time.time(),
            type=mtype,
            visibility=visibility,
            target_audience=target_audience,
        )
        self.messages.append(msg)
        return msg

    def system(self, text: str) -> ChatMessage:
        return self.post(0, "System", text, mtype="system")

    def visible(self, viewer_id: int) -> list[ChatMessage]:
        """Visibility gate (reference: types.ts:332-334 semantics)."""
        out = []
        v = str(viewer_id)
        for m in self.messages:
            if m.visibility == "hidden":
                continue
            if m.visibility == "private" and v not in (m.target_audience or []) and m.playerId != v:
                continue
            out.append(m)
        return out

    # -- bot responder ---------------------------------------------------------

    def bot_reply(self, sender_id: int, sender_name: str, text: str,
                  snapshot: dict[str, Any]) -> Optional[ChatMessage]:
        """Generate a deterministic bot reply to a chat message.

        Addressing: 'to Bot N:' / '@N' selects bot N; otherwise a stable
        hash picks an alive bot (never player 1, never dead players).
        Private messages to a bot get a private reply back.
        """
        players = snapshot.get("player_states", {})
        m = _TO_BOT.match(text)
        private = bool(m)
        alive_bots = [
            int(pid)
            for pid, row in players.items()
            if int(pid) != 1 and row.get("is_alive", True)
        ]
        if not alive_bots:
            return None
        if m:
            want = int(m.group(1) or m.group(2))
            if want not in alive_bots:
                return None
            bot = want
            text = text[m.end():].strip() or text
        else:
            h = splitmix32((self.seed * 31 + len(self.messages)) & 0xFFFFFFFF)
            bot = alive_bots[h % len(alive_bots)]

        kind = "default"
        for rx, k in _KEYWORDS:
            if rx.search(text):
                kind = k
                break
        pool = _REPLIES[kind]
        h2 = splitmix32((self.seed + len(self.messages) * 7 + bot) & 0xFFFFFFFF)
        reply = pool[h2 % len(pool)].format(sender=sender_name)
        bot_name = players.get(str(bot), {}).get("name") or f"Player {bot}"
        return self.post(
            bot, bot_name, reply,
            visibility="private" if private else "public",
            target_audience=[str(sender_id)] if private else None,
        )
