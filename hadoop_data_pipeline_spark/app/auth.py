"""Login gate for the dashboard shell (reference
``dashboard/auth.py:5-48``).

The reference checks a username/password mapping held in Streamlit
secrets and keeps the flag in ``st.session_state``. Re-expressed as an
injectable store + explicit session object so the logic tests without
a UI host and plugs into any session mechanism (Streamlit session
state, a cookie-backed web session, a CLI context)."""

from __future__ import annotations

import hmac
from collections.abc import Mapping
from dataclasses import dataclass, field


@dataclass
class Session:
    """The mutable per-user state the reference keeps in
    ``st.session_state``: who is logged in plus the chat workspace."""

    authenticated: bool = False
    username: str | None = None
    messages: list[dict] = field(default_factory=list)
    current_chat_id: int | None = None


class Authenticator:
    """Credential check against an injected user->password mapping.

    Comparison uses :func:`hmac.compare_digest` (the reference's plain
    ``==`` leaks timing); unknown users compare against a dummy string
    so presence/absence is not distinguishable either.
    """

    def __init__(self, users: Mapping[str, str]):
        self._users = dict(users)

    def check_login(self, username: str, password: str) -> bool:
        # Compare BYTES: compare_digest on str raises TypeError for
        # non-ASCII input, which would turn a wrong 'pässw0rt' into a
        # crash instead of a clean False.
        expected = self._users.get(username)
        if expected is None:
            hmac.compare_digest(b"missing-user-dummy", password.encode())
            return False
        return hmac.compare_digest(expected.encode(), password.encode())

    def login(self, session: Session, username: str, password: str) -> bool:
        """Reference ``login_page`` submit handler: flip the session
        flags only on a correct credential pair."""
        if self.check_login(username, password):
            session.authenticated = True
            session.username = username
            return True
        return False

    @staticmethod
    def logout(session: Session) -> None:
        """Reference ``auth.logout``: clear auth AND workspace state
        (a stale chat must not survive into the next login)."""
        session.authenticated = False
        session.username = None
        session.messages = []
        session.current_chat_id = None

    @staticmethod
    def require_auth(session: Session) -> bool:
        """Reference ``require_auth``: True when the page may render;
        the host shows the login page and stops otherwise."""
        return session.authenticated
