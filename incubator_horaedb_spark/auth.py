"""File-backed Basic authentication (proxy/src/auth/{mod,with_file}.rs).

The reference loads a CSV credential file (one ``user,password`` per
line) and verifies the ``authorization: Basic <base64(user:pass)>``
header on incoming requests — disabled auth admits everything, enabled
auth rejects missing/malformed headers and unknown users.  The reference
wires this as a request interceptor; here the HTTP server
(server.EngineServer) consults it on every route when constructed with
an enabled instance.
"""

from __future__ import annotations

import base64
import binascii
import os


AUTHORIZATION = "authorization"  # auth/mod.rs:23


class AuthWithFile:
    """auth/with_file.rs AuthWithFile: enable flag + user→password map."""

    def __init__(self, enable: bool, file_path: str):
        self.enable = enable
        self.file_path = file_path
        self.users: dict[str, str] = {}

    def load_credential(self) -> None:
        """Load the CSV credential file (with_file.rs load_credential):
        no-op when disabled; missing file and malformed lines are errors.
        Re-loading replaces the whole credential set, so removing a user
        from the file revokes them on the next load — an append-only map
        would keep deleted credentials valid until restart."""
        if not self.enable:
            return
        if not os.path.exists(self.file_path):
            raise FileNotFoundError(f"file not existed: {self.file_path!r}")
        users: dict[str, str] = {}
        with open(self.file_path, encoding="utf-8") as fh:
            for line in fh:
                # tolerate CRLF files: a \r kept in the password would
                # reject every correct login with 401
                line = line.rstrip("\r\n")
                if not line:
                    continue
                if "," not in line:
                    raise ValueError(f"invalid line: {line!r}")
                user, password = line.split(",", 1)
                users[user] = password
        self.users = users

    def identify(self, header: str | None) -> bool:
        """with_file.rs identify: disabled → admit; otherwise the header
        must be ``Basic <base64(user:pass)>`` for a known user.  The
        scheme is a PREFIX match (RFC 7617): a header merely containing
        "Basic " elsewhere (e.g. ``Bearer Basic <blob>``) is not Basic
        auth and is rejected."""
        if not self.enable:
            return True
        if header is None:
            return False
        if not header.startswith("Basic "):
            return False
        encoded = header.split("Basic ", 1)[1]
        try:
            decoded = base64.b64decode(encoded, validate=True).decode("utf-8")
        except (binascii.Error, UnicodeDecodeError, ValueError):
            return False
        if ":" not in decoded:
            return False
        user, password = decoded.split(":", 1)
        # constant-time comparison: dict.get == password leaks the match
        # prefix length through timing.  Compare UTF-8 BYTES — compare_digest
        # on str raises TypeError for non-ASCII input, which would abort the
        # connection instead of returning 401 and lock out legitimate
        # non-ASCII passwords (ADVICE r11).  Evaluate the digest compare
        # UNCONDITIONALLY before AND-ing with membership: `user in self.users
        # and ...` would short-circuit and reopen the username-enumeration
        # timing signal this path exists to close (ADVICE r11).
        import hmac

        ok = hmac.compare_digest(
            self.users.get(user, "").encode("utf-8"), password.encode("utf-8")
        )
        return ok and user in self.users
