"""Conversation templates (FastChat-style prompt assembly).

Capability parity with /root/reference/UniMP/pipeline/conversation.py:
a Conversation dataclass accumulates (role, message) turns and renders
the model prompt under a separator style; templates registered by name.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "\n"
    sep2: str = "</s>"

    def get_prompt(self) -> str:
        if self.sep_style == SeparatorStyle.SINGLE:
            out = self.system + self.sep
            for role, msg in self.messages:
                out += f"{role}: {msg}{self.sep}" if msg else f"{role}:"
            return out
        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            out = self.system + seps[0]
            for i, (role, msg) in enumerate(self.messages):
                out += (
                    f"{role}: {msg}{seps[i % 2]}" if msg else f"{role}:"
                )
            return out
        raise ValueError(self.sep_style)

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append([role, message])

    def to_gradio_chatbot(self):
        """(user, assistant) pairs for chat UIs."""
        ret = []
        for i, (_, msg) in enumerate(self.messages[self.offset:]):
            if i % 2 == 0:
                ret.append([msg, None])
            else:
                ret[-1][-1] = msg
        return ret

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
        )

    def dict(self):
        return {
            "system": self.system,
            "roles": self.roles,
            "messages": self.messages,
            "offset": self.offset,
            "sep": self.sep,
            "sep2": self.sep2,
        }


CONV_TEMPLATES = {
    "unimp": Conversation(
        system=(
            "You are a personalized shopping assistant. Given a user's "
            "interaction history with item images, answer questions about "
            "recommendations, search, ratings and item selection."
        ),
        roles=("User", "Assistant"),
        messages=[],
    ),
    "plain": Conversation(system="", roles=("", ""), messages=[]),
}


def get_conv_template(name: str) -> Conversation:
    return CONV_TEMPLATES[name].copy()
