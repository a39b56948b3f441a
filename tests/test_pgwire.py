"""Wire-protocol replication client tests against an in-process fake
walsender (no Postgres, no psycopg2): handshake + SCRAM/MD5 auth, simple
query, CopyBoth streaming, standby-status ack propagation, and end-to-end
parity with the directly-written replay log."""

import base64
import hashlib
import hmac
import json
import os
import socket
import struct
import threading
import time

import pytest

from pypgcdc_spark.cdc import pgoutput as pg  # noqa: F401 (workload synth)
from pypgcdc_spark.sources.pgwire import (
    AUTH_MD5,
    _copy_escape,
    AUTH_OK,
    AUTH_SASL,
    AUTH_SASL_CONTINUE,
    AUTH_SASL_FINAL,
    PG_EPOCH_US,
    ProtocolError,
    ReplicationClient,
    WireReplicationTailer,
    md5_password_response,
    read_message,
    write_message,
)
from pypgcdc_spark.sources.replay import scan_frames
from pypgcdc_spark.testing import (
    INTEGRATION_COLS,
    INTEGRATION_RELID,
    WorkloadWriter,
    write_reference_workload,
    write_upsert_workload,
)

USER, PASSWORD, DB = "rep", "secret", "mydb"


class FakeWalsender(threading.Thread):
    """Fake server driving the documented protocol flow.

    Fault-injection knobs (round-3 hardening scenarios):
    ``keepalive_every`` — reply-requested keepalive after every Nth frame;
    ``drop_after`` — abruptly close the FIRST connection after N frames
    (optionally mid-message with ``drop_partial``), no CopyDone;
    ``max_conns`` — accept this many sequential connections, serving each
    START_REPLICATION from its requested LSN (resend-inclusive, like a
    real walsender);
    ``start_error_sqlstate`` — fail every START_REPLICATION with this
    SQLSTATE instead of streaming."""

    def __init__(
        self,
        auth="scram",
        frames=(),
        slot_exists=False,
        keepalive_every=0,
        drop_after=None,
        drop_partial=False,
        max_conns=1,
        start_error_sqlstate=None,
        advertise_plus=False,
        corrupt_server_sig=False,
        idle_before_stream=0.0,
        keepalive_reply_deadline=None,
        tls_ctx=None,
        cert_der=None,
        copy_drop_after=None,
        server_version="16.0",
    ):
        super().__init__(daemon=True)
        # TLS: an ssl.SSLContext makes the server answer SSLRequest with
        # 'S' and wrap the connection; None answers 'N' (TLS refused).
        # cert_der is the server certificate (for -PLUS channel-binding
        # verification); copy_drop_after kills the FIRST COPY connection
        # after N CopyData messages (reconnect-mid-initial-sync model).
        self.tls_ctx = tls_ctx
        self.cert_der = cert_der
        if cert_der is not None:
            from pypgcdc_spark.sources.pgwire import tls_server_end_point

            # computed at construction: a later monkeypatch of the client
            # helper must not also blind the server's verification
            self._cb_hash = tls_server_end_point(cert_der)
        self.copy_drop_after = copy_drop_after
        self._copy_attempts = 0
        # Emulated server version: advertised via ParameterStatus AND
        # enforced on START_REPLICATION options with protocol-true errors
        # (pgoutput's actual capability history: proto 1 only before 14;
        # binary/messages/streaming at 14/proto 2; two_phase at 15/proto 3).
        self.server_version = server_version
        self.sasl_mechs = []  # mechanism each client picked
        self.auth = auth
        self.frames = list(frames)  # [(lsn, payload)]
        self.slot_exists = slot_exists
        self.keepalive_every = keepalive_every
        self.drop_after = drop_after
        self.drop_partial = drop_partial
        self.max_conns = max_conns
        self.start_error_sqlstate = start_error_sqlstate
        # Round-5 edge knobs (VERDICT r4 item 1 fallback):
        # advertise SCRAM-SHA-256-PLUS alongside SCRAM-SHA-256 (as a real
        # PG does over SSL) — the client must pick the non-PLUS mechanism
        # with gs2 flag 'n' and c=biws; 'y' would be a downgrade signal.
        self.advertise_plus = advertise_plus
        # Send a wrong SCRAM server signature (MITM / wrong-server model).
        self.corrupt_server_sig = corrupt_server_sig
        # Idle gap before streaming, then a reply-REQUIRED keepalive whose
        # answer must arrive within the deadline or the connection is
        # killed (wal_sender_timeout model).
        self.idle_before_stream = idle_before_stream
        self.keepalive_reply_deadline = keepalive_reply_deadline
        self.keepalive_timeout_kills = 0
        self.created_slots = []
        self.start_requests = []  # LSNs clients asked to stream from
        self.start_options = []  # option lists from START_REPLICATION
        self.connections = 0
        self._dropped = False
        self.feedback = []  # flushed LSNs from Standby Status Updates
        self.keepalive_replies = 0
        self._done = threading.Event()  # a clean CopyDone ends the accept loop
        # COPY initial-sync knobs: table name -> list of row tuples; the
        # snapshot names clients imported via SET TRANSACTION SNAPSHOT.
        self.copy_tables = {}
        self.imported_snapshots = []
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(max_conns)
        self.port = self.srv.getsockname()[1]
        self.error = None

    def run(self):
        # One thread per connection: a snapshot-import COPY connection
        # can run WHILE the replication connection streams, like real PG.
        threads = []
        try:
            for _ in range(self.max_conns):
                self.srv.settimeout(10)
                conn, _ = self.srv.accept()
                self.connections += 1
                conn.settimeout(10)
                t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
                t.start()
                threads.append(t)
                if self._done.wait(timeout=0.01):
                    break
            for t in threads:
                t.join(30)
        except Exception as e:  # surfaced by tests via self.error
            self.error = e
        finally:
            self.srv.close()

    def _serve(self, conn):
        try:
            if self._handle(conn):
                self._done.set()
        except Exception as e:
            self.error = e

    # -- protocol pieces ---------------------------------------------------

    def _maybe_tls(self, conn):
        """Handle an optional SSLRequest before the StartupMessage.
        Returns (conn, is_tls, pending_len): pending_len is a startup
        length already consumed when the first message was NOT an
        SSLRequest."""
        (ln,) = struct.unpack(">i", self._exact(conn, 4))
        if ln == 8:
            (code,) = struct.unpack(">i", self._exact(conn, 4))
            assert code == 80877103  # SSLRequest magic
            if self.tls_ctx is None:
                conn.sendall(b"N")
                return conn, False, None
            conn.sendall(b"S")
            tls = self.tls_ctx.wrap_socket(conn, server_side=True)
            tls.settimeout(10)
            return tls, True, None
        return conn, False, ln

    def _startup(self, conn, pending_len=None):
        ln = pending_len
        if ln is None:
            (ln,) = struct.unpack(">i", self._exact(conn, 4))
        body = self._exact(conn, ln - 4)
        (ver,) = struct.unpack(">i", body[:4])
        assert ver == 196608
        kv = body[4:].split(b"\x00")
        params = dict(zip(kv[0::2], kv[1::2]))
        assert params[b"user"].decode() == USER
        assert params[b"replication"] == b"database"
        return params

    def _exact(self, conn, n):
        buf = b""
        while len(buf) < n:
            c = conn.recv(n - len(buf))
            if not c:
                raise ProtocolError("client closed")
            buf += c
        return buf

    def _auth_exchange(self, conn, is_tls=False):
        if self.auth == "trust":
            write_message(conn, b"R", struct.pack(">i", AUTH_OK))
            return
        if self.auth == "md5":
            salt = b"\x01\x02\x03\x04"
            write_message(conn, b"R", struct.pack(">i", AUTH_MD5) + salt)
            t, b = read_message(conn)
            assert t == b"p"
            if b != md5_password_response(USER, PASSWORD, salt):
                self._fail_auth(conn)
            write_message(conn, b"R", struct.pack(">i", AUTH_OK))
            return
        # SCRAM-SHA-256 server side.  Like real PG, -PLUS is advertised
        # over TLS (channel binding is only possible there) or when the
        # advertise_plus knob forces the downgrade-detection scenario.
        mechs = (
            b"SCRAM-SHA-256-PLUS\x00SCRAM-SHA-256\x00\x00"
            if (self.advertise_plus or is_tls)
            else b"SCRAM-SHA-256\x00\x00"
        )
        write_message(conn, b"R", struct.pack(">i", AUTH_SASL) + mechs)
        t, b = read_message(conn)
        assert t == b"p"
        mech, rest = b.split(b"\x00", 1)
        self.sasl_mechs.append(mech.decode())
        # The client must never pick -PLUS on a plaintext socket.
        assert mech == (b"SCRAM-SHA-256-PLUS" if is_tls else b"SCRAM-SHA-256")
        (ln,) = struct.unpack(">i", rest[:4])
        client_first = rest[4 : 4 + ln].decode()
        if is_tls:
            gs2 = "p=tls-server-end-point,,"
            assert client_first.startswith(gs2)
            expected_c = base64.b64encode(gs2.encode() + self._cb_hash).decode()
        else:
            if self.advertise_plus:
                # RFC 5802 downgrade detection: gs2 flag 'y' ("I support
                # channel binding but you don't seem to") against a server
                # that DID advertise -PLUS must be rejected, like real PG.
                if client_first.startswith("y"):
                    self._fail_auth(conn)
                assert client_first.startswith("n,,")
            expected_c = "biws"  # base64("n,,")
        client_first_bare = client_first.split(",", 2)[2]
        cnonce = dict(kv.split("=", 1) for kv in client_first_bare.split(","))["r"]
        snonce = cnonce + "SERVERNONCE"
        salt, iters = b"saltsalt", 4096
        server_first = f"r={snonce},s={base64.b64encode(salt).decode()},i={iters}"
        write_message(
            conn, b"R", struct.pack(">i", AUTH_SASL_CONTINUE) + server_first.encode()
        )
        t, b = read_message(conn)
        assert t == b"p"
        client_final = b.decode()
        parts = dict(kv.split("=", 1) for kv in client_final.split(","))
        # Channel-binding verification: on TLS the c= value must carry
        # the gs2 header + THIS server's certificate hash — a client
        # bound to a MITM's certificate fails here even with the right
        # password.  Plaintext clients must send base64("n,,").
        if parts["c"] != expected_c:
            self._fail_auth(conn)
        proof = base64.b64decode(parts["p"])
        client_final_bare = client_final.rsplit(",p=", 1)[0]
        auth_message = ",".join([client_first_bare, server_first, client_final_bare])
        salted = hashlib.pbkdf2_hmac("sha256", PASSWORD.encode(), salt, iters)
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        client_sig = hmac.new(stored_key, auth_message.encode(), hashlib.sha256).digest()
        recovered = bytes(a ^ b for a, b in zip(proof, client_sig))
        if hashlib.sha256(recovered).digest() != stored_key:
            self._fail_auth(conn)
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        server_sig = hmac.new(server_key, auth_message.encode(), hashlib.sha256).digest()
        if self.corrupt_server_sig:
            server_sig = bytes(32)  # wrong signature: client must detect
        write_message(
            conn,
            b"R",
            struct.pack(">i", AUTH_SASL_FINAL)
            + b"v="
            + base64.b64encode(server_sig),
        )
        write_message(conn, b"R", struct.pack(">i", AUTH_OK))

    def _fail_auth(self, conn):
        write_message(
            conn, b"E", b"SFATAL\x00C28P01\x00Mpassword authentication failed\x00\x00"
        )
        raise ProtocolError("auth failed (sent to client)")

    def _ready(self, conn):
        write_message(
            conn, b"S", b"server_version\x00" + self.server_version.encode() + b"\x00"
        )
        write_message(conn, b"K", struct.pack(">ii", 1234, 5678))
        write_message(conn, b"Z", b"I")

    def _start_options_error(self, opts: str):
        """Protocol-true validation of START_REPLICATION pgoutput options
        for the emulated server version (messages per pgoutput.c)."""
        import re as _re

        major = int(self.server_version.split(".")[0])
        pairs = dict(_re.findall(r"(\w+) '([^']*)'", opts))
        max_proto = 1 if major < 14 else 2 if major == 14 else 3 if major == 15 else 4
        allowed = {"proto_version", "publication_names"}
        if major >= 14:
            allowed |= {"binary", "messages", "streaming"}
        if major >= 15:
            allowed |= {"two_phase"}
        for k in pairs:
            if k not in allowed:
                return f"unrecognized pgoutput option: {k}"
        proto = int(pairs.get("proto_version", "1"))
        if proto > max_proto:
            return (
                f"client sent proto_version={proto} but we only support "
                f"protocol {max_proto} or lower"
            )
        if pairs.get("two_phase") in ("on", "true", "1") and proto < 3:
            return (
                f"requested proto_version={proto} does not support "
                "two-phase commit, need 3 or higher"
            )
        if pairs.get("streaming") in ("on", "true", "1") and proto < 2:
            return (
                f"requested proto_version={proto} does not support "
                "streaming of large transactions, need 2 or higher"
            )
        return None

    def _send_rows(self, conn, cols, rows):
        body = struct.pack(">h", len(cols))
        for c in cols:
            body += c.encode() + b"\x00" + struct.pack(">ihihih", 0, 0, 25, -1, -1, 0)
        write_message(conn, b"T", body)
        for row in rows:
            rb = struct.pack(">h", len(row))
            for v in row:
                if v is None:
                    rb += struct.pack(">i", -1)
                else:
                    ev = v.encode()
                    rb += struct.pack(">i", len(ev)) + ev
            write_message(conn, b"D", rb)
        write_message(conn, b"C", b"SELECT\x00")
        write_message(conn, b"Z", b"I")

    def _handle(self, conn):
        conn, is_tls, pending_len = self._maybe_tls(conn)
        self._startup(conn, pending_len)
        self._auth_exchange(conn, is_tls)
        self._ready(conn)
        while True:
            try:
                t, b = read_message(conn)
            except ProtocolError:
                return
            if t == b"X":
                return
            assert t == b"Q"
            sql = b.rstrip(b"\x00").decode()
            if sql == "IDENTIFY_SYSTEM":
                self._send_rows(
                    conn,
                    ["systemid", "timeline", "xlogpos", "dbname"],
                    [("7000000000000000001", "1", "0/1000", DB)],
                )
            elif sql.startswith("CREATE_REPLICATION_SLOT"):
                slot = sql.split()[1]
                self.created_slots.append(slot)
                self.slot_exists = True
                self._send_rows(
                    conn,
                    ["slot_name", "consistent_point", "snapshot_name", "output_plugin"],
                    [(slot, "0/1000", "00000003-00000002-1", "pgoutput")],
                )
            elif sql.startswith("BEGIN") or sql == "COMMIT":
                write_message(conn, b"C", sql.split()[0].encode() + b"\x00")
                write_message(conn, b"Z", b"T" if sql.startswith("BEGIN") else b"I")
            elif sql.startswith("SET TRANSACTION SNAPSHOT"):
                self.imported_snapshots.append(sql.split("'")[1])
                write_message(conn, b"C", b"SET\x00")
                write_message(conn, b"Z", b"T")
            elif sql.startswith("COPY"):
                import itertools
                import re as _re

                table = _re.search(r"FROM\s+(\w+)", sql).group(1)
                rows = self.copy_tables.get(table, [])
                if callable(rows):  # generator factory: big-table scenarios
                    rows = rows()
                it = iter(rows)
                first = next(it, None)
                ncols = len(first) if first is not None else 0
                # CopyOutResponse: int8 overall format, int16 ncols, formats
                write_message(
                    conn, b"H", struct.pack(">bh", 0, ncols) + b"\x00\x00" * ncols
                )
                self._copy_attempts += 1
                drop_at = (
                    self.copy_drop_after if self._copy_attempts == 1 else None
                )
                sent = 0
                for row in itertools.chain([first] if first is not None else [], it):
                    if drop_at is not None and sent >= drop_at:
                        # Abrupt mid-COPY connection loss (no CopyDone):
                        # the client must discard and retry the sync.
                        conn.close()
                        return False
                    line = "\t".join(_copy_escape(v) for v in row) + "\n"
                    write_message(conn, b"d", line.encode())
                    sent += 1
                write_message(conn, b"c")
                write_message(conn, b"C", b"COPY\x00")
                write_message(conn, b"Z", b"I")
            elif sql.startswith("START_REPLICATION"):
                if self.start_error_sqlstate is not None:
                    code = self.start_error_sqlstate.encode()
                    write_message(
                        conn,
                        b"E",
                        b"SERROR\x00C" + code + b"\x00Mstart refused (fake)\x00\x00",
                    )
                    write_message(conn, b"Z", b"I")
                    continue
                if not self.slot_exists:
                    write_message(
                        conn,
                        b"E",
                        b"SERROR\x00C42704\x00Mreplication slot does not exist\x00\x00",
                    )
                    write_message(conn, b"Z", b"I")
                    continue
                hi, lo = sql.split()[4].split("/")
                start_lsn = (int(hi, 16) << 32) | int(lo, 16)
                optstr = sql[sql.index("(") :] if "(" in sql else ""
                err = self._start_options_error(optstr)
                if err is not None:
                    write_message(
                        conn,
                        b"E",
                        b"SERROR\x00C22023\x00M" + err.encode() + b"\x00\x00",
                    )
                    write_message(conn, b"Z", b"I")
                    continue
                self.start_requests.append(start_lsn)
                self.start_options.append(optstr)
                write_message(conn, b"W", struct.pack(">bh", 0, 0))
                return self._stream(conn, start_lsn)
            else:
                raise AssertionError(f"unexpected SQL {sql!r}")

    def _stream(self, conn, start_lsn=0):
        """Stream frames from ``start_lsn`` (resend-INCLUSIVE, like a real
        walsender restarting a slot).  Returns True on a clean CopyDone,
        False when the drop_after fault fired."""
        conn.settimeout(0.05)
        if self.idle_before_stream:
            # Silence: the client sees idle timeouts and should keep the
            # session alive with proactive standby statuses.
            time.sleep(self.idle_before_stream)
            self._drain_client(conn)
        if self.keepalive_reply_deadline is not None:
            # wal_sender_timeout model: a reply-REQUIRED keepalive whose
            # answer must arrive within the deadline, else the walsender
            # kills the connection.
            write_message(
                conn, b"d", b"k" + struct.pack(">qq", start_lsn, 1_000_000) + b"\x01"
            )
            conn.settimeout(self.keepalive_reply_deadline)
            got_reply = False
            try:
                while not got_reply:
                    t, b = read_message(conn)
                    if t == b"d" and b[:1] == b"r":
                        self.feedback.append(struct.unpack(">qqqqb", b[1:34])[1])
                        self.keepalive_replies += 1
                        got_reply = True
            except (socket.timeout, ProtocolError):
                pass
            if not got_reply:
                self.keepalive_timeout_kills += 1
                conn.close()
                return False
            conn.settimeout(0.05)
        frames = [(l, p) for (l, p) in self.frames if l >= start_lsn]
        mid = len(frames) // 2
        for i, (lsn, payload) in enumerate(frames):
            if (
                self.drop_after is not None
                and not self._dropped
                and i >= self.drop_after
            ):
                self._dropped = True
                if self.drop_partial:
                    # Half a message: type + length claiming a 100-byte
                    # body, then nothing — the client must treat the
                    # truncated read as a framing error, not data.
                    conn.sendall(b"d" + struct.pack(">i", 104))
                conn.close()
                return False
            body = b"w" + struct.pack(">qqq", lsn, lsn, 1_000_000) + payload
            write_message(conn, b"d", body)
            if i == mid or (
                self.keepalive_every and (i + 1) % self.keepalive_every == 0
            ):  # keepalive demanding a reply, mid-stream
                write_message(
                    conn, b"d", b"k" + struct.pack(">qq", lsn, 1_000_000) + b"\x01"
                )
            self._drain_client(conn)
        # Give the client a moment to flush acks, then finish the copy.
        for _ in range(20):
            if self._drain_client(conn):
                break
        write_message(conn, b"c")
        conn.settimeout(5)
        self._drain_client(conn)
        return True

    def _drain_client(self, conn):
        got = False
        while True:
            try:
                t, b = read_message(conn)
            except (socket.timeout, ProtocolError):
                return got
            if t == b"d" and b[:1] == b"r":
                _, flushed, _, _, _ = struct.unpack(">qqqqb", b[1:34])
                self.feedback.append(flushed)
                got = True
            elif t == b"d" and b[:1] == b"k":
                self.keepalive_replies += 1
            elif t == b"X":
                return got


def _workload_frames(tmp_path):
    src = str(tmp_path / "src.log")
    write_reference_workload(src)
    return [(fr.lsn, fr.payload) for fr in scan_frames(src)], src


def test_scram_auth_identify_and_slot_create(tmp_path):
    srv = FakeWalsender(auth="scram")
    srv.start()
    c = ReplicationClient("127.0.0.1", srv.port, USER, DB, PASSWORD)
    c.connect()
    assert c.parameters.get("server_version") == "16.0"
    ident = c.identify_system()
    assert ident["dbname"] == DB and ident["xlogpos"] == "0/1000"
    info = c.create_replication_slot("s1")
    assert info["snapshot_name"] == "00000003-00000002-1"
    assert info["output_plugin"] == "pgoutput"
    c.close()
    srv.join(5)
    assert srv.error is None
    assert srv.created_slots == ["s1"]


def test_md5_auth(tmp_path):
    srv = FakeWalsender(auth="md5")
    srv.start()
    c = ReplicationClient("127.0.0.1", srv.port, USER, DB, PASSWORD)
    c.connect()
    assert c.identify_system()["timeline"] == "1"
    c.close()
    srv.join(5)
    assert srv.error is None


def test_scram_rejects_wrong_password():
    srv = FakeWalsender(auth="scram")
    srv.start()
    c = ReplicationClient("127.0.0.1", srv.port, USER, DB, "wrong")
    with pytest.raises(ProtocolError, match="auth|SASL"):
        c.connect()
    c.close()


def test_stream_to_replay_log_decode_parity_and_acks(tmp_path):
    frames, src = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=False)
    srv.start()

    log = str(tmp_path / "wire.log")
    # Pre-existing ack sidecar (as the pgcdc source's commit() writes it):
    # the tailer must forward it as a Standby Status Update.
    ack_lsn = frames[2][0]
    with open(log + ".ack", "w") as f:
        json.dump({"pos": 999, "lsn": ack_lsn}, f)

    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log
    )
    tailer.start()  # slot missing → created (exported snapshot) → retry
    assert tailer.snapshot_name == "00000003-00000002-1"
    n = tailer.run()
    tailer.stop()
    srv.join(10)
    assert srv.error is None
    assert n == len(frames)

    # Byte-for-byte frame parity with the directly-written log.
    got = [(fr.lsn, fr.payload) for fr in scan_frames(log)]
    assert got == frames

    # The ack sidecar LSN reached the server as flushed feedback.
    assert ack_lsn in srv.feedback
    # The mid-stream reply-requested keepalive was honored (a status update
    # arrived after it — feedback list is non-empty beyond the sidecar ack).
    assert len(srv.feedback) >= 1

    # Decoded event parity via the transform layer (no Spark needed).
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    xform = MessageTransformer(registry=SchemaRegistry())
    events = []
    for fr in scan_frames(log):
        events.extend(xform.feed(fr.lsn, fr.payload))
    assert [e.op for e in events] == ["I", "U", "D", "I"]


def _tail_and_decode(tmp_path, srv, log_name="wire.log", proto=None, **run_kw):
    """Start a tailer against ``srv``, drain, return (n, frames, events, xform)."""
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    log = str(tmp_path / log_name)
    kw = {}
    if proto is not None:
        kw = dict(proto_version=proto, streaming=True, two_phase=True)
    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log, **kw
    )
    tailer.start()
    n = tailer.run(**run_kw)
    tailer.stop()
    srv.join(10)
    assert srv.error is None
    got = [(fr.lsn, fr.payload) for fr in scan_frames(log)]
    xform = MessageTransformer(registry=SchemaRegistry())
    events = []
    for fr in scan_frames(log):
        events.extend(xform.feed(fr.lsn, fr.payload))
    return n, got, events, tailer, xform


def test_interleaved_txs_survive_keepalive_flood(tmp_path):
    """A reply-requested keepalive lands after EVERY frame — between Begin
    and its ops, inside transactions, between them.  Transaction assembly
    and frame parity must be unaffected and every request honored."""
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True, keepalive_every=1)
    srv.start()
    n, got, events, tailer, _ = _tail_and_decode(tmp_path, srv)
    assert n == len(frames)
    assert got == frames
    assert [e.op for e in events] == ["I", "U", "D", "I"]
    # Each event carries an intact Begin..Commit context despite the
    # keepalive interleaving.
    assert all(e.tx_id is not None and e.commit_lsn is not None for e in events)
    # One status update per reply-requested keepalive reached the server.
    assert len(srv.feedback) >= len(frames) - 1


def test_midstream_relation_resend_versions_schema(tmp_path):
    """A Relation re-send with changed columns mid-stream (ALTER TABLE on
    the publisher) must bump the versioned registry over the wire and type
    subsequent events with the new column set."""
    src = str(tmp_path / "schema_change.log")
    w = WorkloadWriter(src)
    relid = 17001
    w.relation(relid, "people", [(True, "id", 23, -1), (False, "name", 25, -1)])
    w.tx([pg.encode_insert(relid, ["1", "alice"])])
    # ALTER TABLE people ADD COLUMN email: walsender re-sends Relation.
    w.relation(
        relid,
        "people",
        [(True, "id", 23, -1), (False, "name", 25, -1), (False, "email", 25, -1)],
    )
    w.tx([pg.encode_insert(relid, ["2", "bob", "bob@example.com"])])
    w.close()
    frames = [(fr.lsn, fr.payload) for fr in scan_frames(src)]

    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv.start()
    n, got, events, _, xform = _tail_and_decode(tmp_path, srv)
    assert n == len(frames)
    assert [e.op for e in events] == ["I", "I"]
    assert set(events[0].after) == {"id", "name"}
    assert set(events[1].after) == {"id", "name", "email"}
    assert events[1].after["email"] == "bob@example.com"
    # The registry holds both versions, LSN-addressable.
    chain = xform.registry._versions[(xform.registry.database, relid)]
    assert [v.version for v in chain] == [1, 2]
    v1 = xform.registry.get_at_lsn(relid, chain[0].first_lsn)
    assert [c.name for c in v1.column_definitions] == ["id", "name"]
    v2 = xform.registry.get_at_lsn(relid, chain[1].first_lsn)
    assert [c.name for c in v2.column_definitions] == ["id", "name", "email"]


def test_toast_unchanged_tuples_over_the_wire(tmp_path):
    """An UPDATE whose big column arrives as TOAST 'u' must survive the
    wire → replay log → transform path as the TOAST_UNCHANGED sentinel,
    not NULL (reference Q6 fix, here proven end-to-end over the socket)."""
    from pypgcdc_spark.cdc.models import TOAST_UNCHANGED

    src = str(tmp_path / "toast.log")
    w = WorkloadWriter(src)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w.tx([pg.encode_insert(INTEGRATION_RELID, ["1", "{}", "1.00", None, "BIGVALUE"])])
    w.tx(
        [
            pg.encode_update(
                INTEGRATION_RELID,
                ["1", "{}", "2.00", None, "ignored"],
                toast_unchanged={4},
            )
        ]
    )
    w.close()
    frames = [(fr.lsn, fr.payload) for fr in scan_frames(src)]

    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv.start()
    n, got, events, _, _ = _tail_and_decode(tmp_path, srv)
    assert n == len(frames)
    assert [e.op for e in events] == ["I", "U"]
    assert events[1].after["text_data"] is TOAST_UNCHANGED
    assert events[1].after["amount"] == "2.00"


def test_reconnect_resumes_from_lsn_without_duplicates(tmp_path):
    """The server drops the connection mid-message after 5 frames (no
    CopyDone).  The tailer must reconnect, START_REPLICATION again, skip
    the resent prefix, and leave a duplicate-free replay log."""
    frames, _ = _workload_frames(tmp_path)
    assert len(frames) > 7
    srv = FakeWalsender(
        auth="trust",
        frames=frames,
        slot_exists=True,
        drop_after=5,
        drop_partial=True,
        max_conns=2,
    )
    srv.start()
    n, got, events, tailer, _ = _tail_and_decode(tmp_path, srv, max_reconnects=1)
    assert tailer.reconnects == 1
    assert srv.connections == 2
    assert len(srv.start_requests) == 2
    assert n == len(frames)
    assert got == frames  # no duplicates, no gaps, original order
    assert [e.op for e in events] == ["I", "U", "D", "I"]


def test_reconnect_keeps_distinct_frames_sharing_one_lsn(tmp_path):
    """Real walsenders emit multiple XLogData frames at one WAL position:
    Relation/Type/Message frames reuse the following change's write
    location, and Begin can share the first change's LSN.  The tailer must
    NOT treat a second same-LSN frame as a resend duplicate — dedup is by
    whole-unit close LSN, so equal-LSN data frames inside a unit survive,
    across a mid-stream reconnect."""
    from datetime import datetime, timezone

    from pypgcdc_spark.cdc import pgoutput as pg

    ts = datetime(2020, 1, 1, tzinfo=timezone.utc)
    relid = 19001
    cols = [(True, "id", 23, -1), (False, "name", 25, -1)]
    frames = [
        # tx1: Begin, Relation and Insert all at LSN 110 (as on a real wire).
        (110, pg.encode_begin(120, ts, 700)),
        (110, pg.encode_relation(relid, "public", "people", cols)),
        (110, pg.encode_insert(relid, ["1", "alice"])),
        (120, pg.encode_commit(120, 120, ts)),
        # tx2: Begin shares the first change's LSN again.
        (210, pg.encode_begin(230, ts, 701)),
        (210, pg.encode_insert(relid, ["2", "bob"])),
        (220, pg.encode_update(relid, ["2", "bobby"])),
        (230, pg.encode_commit(230, 230, ts)),
    ]
    srv = FakeWalsender(
        auth="trust",
        frames=frames,
        slot_exists=True,
        drop_after=5,  # dies mid-tx2: tx1 is in the log, tx2 partially buffered
        drop_partial=True,
        max_conns=2,
    )
    srv.start()
    n, got, events, tailer, _ = _tail_and_decode(tmp_path, srv, max_reconnects=1)
    assert tailer.reconnects == 1
    assert n == len(frames)
    assert got == frames  # every same-LSN frame survived, no dups, no gaps
    assert [e.op for e in events] == ["I", "I", "U"]


def test_start_replication_error_sqlstate_not_masked(tmp_path):
    """A non-42704 START_REPLICATION failure (insufficient_privilege) must
    surface as-is — NOT trigger the create-slot fallback that would bury
    the real error behind a slot-creation attempt."""
    srv = FakeWalsender(auth="trust", slot_exists=True, start_error_sqlstate="42501")
    srv.start()
    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", str(tmp_path / "x.log")
    )
    with pytest.raises(ProtocolError, match="START_REPLICATION failed"):
        tailer.start()
    tailer.stop()
    assert srv.created_slots == []


def test_idle_yields_and_midmessage_timeout_desyncs():
    """Unit contract of the timeout semantics: an idle socket yields
    IdleTimeout (stream keeps going); a timeout after a partial message
    read raises ProtocolError — resuming would be desynced."""
    from pypgcdc_spark.sources.pgwire import IdleTimeout

    a, b = socket.socketpair()
    a.settimeout(0.1)
    c = ReplicationClient("127.0.0.1", 0, USER, DB)
    c.sock = a
    c.streaming = True
    gen = c.read_stream()
    assert isinstance(next(gen), IdleTimeout)  # silence → idle marker
    b.sendall(b"d")  # type byte only, then silence → mid-message timeout
    with pytest.raises(ProtocolError, match="desync"):
        next(gen)
    a.close()
    b.close()


def test_scram_plus_advertised_picks_sha256_with_gs2_n(tmp_path):
    """A server advertising SCRAM-SHA-256-PLUS alongside SCRAM-SHA-256 (as
    real PG does over SSL): the plaintext client must select the non-PLUS
    mechanism with gs2 flag 'n' and c=biws — asserted server-side — and
    the handshake must complete normally."""
    srv = FakeWalsender(auth="scram", advertise_plus=True)
    srv.start()
    c = ReplicationClient("127.0.0.1", srv.port, USER, DB, PASSWORD)
    c.connect()
    assert c.identify_system()["dbname"] == DB
    c.close()
    srv.join(5)
    assert srv.error is None


def test_scram_detects_wrong_server_signature():
    """A wrong SCRAM server signature (MITM / wrong-server model) must be
    rejected by the client even though the server 'accepted' the password
    — mutual authentication, RFC 5802 §3."""
    srv = FakeWalsender(auth="scram", corrupt_server_sig=True)
    srv.start()
    c = ReplicationClient("127.0.0.1", srv.port, USER, DB, PASSWORD)
    with pytest.raises(ProtocolError, match="server signature mismatch"):
        c.connect()
    c.close()


def test_keepalive_reply_required_under_idle(tmp_path):
    """Idle gap, then a reply-REQUIRED keepalive enforced with a deadline
    (wal_sender_timeout model): the tailer's idle loop must keep the
    session alive and answer the keepalive in time — no kill, full
    frame parity after the gap."""
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(
        auth="trust",
        frames=frames,
        slot_exists=True,
        idle_before_stream=0.6,
        keepalive_reply_deadline=3.0,
    )
    srv.start()
    log = str(tmp_path / "idle.log")
    tailer = WireReplicationTailer("127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log)
    tailer.client.timeout = 0.2  # idle gap spans several client timeouts
    tailer.start()
    n = tailer.run()
    tailer.stop()
    srv.join(10)
    assert srv.error is None
    assert srv.keepalive_timeout_kills == 0
    assert srv.keepalive_replies >= 1  # the required reply arrived in time
    assert n == len(frames)
    assert [(fr.lsn, fr.payload) for fr in scan_frames(log)] == frames


def test_keepalive_ignored_gets_disconnected():
    """The negative twin: a client that never answers the reply-required
    keepalive is killed at the deadline — proving the fake actually
    enforces the timeout the tailer is tested against."""
    from pypgcdc_spark.sources.pgwire import PrimaryKeepalive

    srv = FakeWalsender(
        auth="trust", frames=[], slot_exists=True, keepalive_reply_deadline=0.3
    )
    srv.start()
    c = ReplicationClient("127.0.0.1", srv.port, USER, DB, timeout=2.0)
    c.connect()
    c.start_replication("slot1", "pub1")
    gen = c.read_stream()
    msg = next(gen)
    assert isinstance(msg, PrimaryKeepalive) and msg.reply_requested
    # Ignore it. The server must cut the connection at the deadline.
    with pytest.raises((ProtocolError, OSError)):
        for _ in range(50):
            next(gen)
    srv.join(5)
    assert srv.keepalive_timeout_kills == 1
    c.close()


def test_streamed_v2_frames_over_the_wire(tmp_path):
    """Protocol v2 end-to-end over the socket: a walsender streaming
    Stream Start/Stop/Commit segments (with in-segment xid-prefixed DML)
    ships through the tailer byte-transparently, and the replay-log
    decode reassembles the interleaved transactions exactly as if the
    log had been written directly."""
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer
    from pypgcdc_spark.testing import write_streamed_cdc_pair

    src_plain = str(tmp_path / "plain.log")
    src_streamed = str(tmp_path / "streamed.log")
    rows = [((i * 5) % 13, "error" if i % 7 == 3 else f"ev{i % 3}", i * 1.5) for i in range(120)]
    write_streamed_cdc_pair(src_plain, src_streamed, rows, chunk=20)
    frames = [(fr.lsn, fr.payload) for fr in scan_frames(src_streamed)]

    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv.start()
    log = str(tmp_path / "wire_v2.log")
    tailer = WireReplicationTailer("127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log)
    tailer.start()
    n = tailer.run()
    tailer.stop()
    srv.join(10)
    assert srv.error is None and n == len(frames)
    assert [(fr.lsn, fr.payload) for fr in scan_frames(log)] == frames

    def state(path):
        x = MessageTransformer(registry=SchemaRegistry())
        evs = []
        for fr in scan_frames(path):
            evs.extend(x.feed(fr.lsn, fr.payload))
        evs.sort(key=lambda e: e.lsn)
        st = {}
        for ev in evs:
            k = ev.key["user_id"]
            if ev.op == "D":
                st.pop(k, None)
            else:
                st[k] = (ev.after["last_event"], ev.after["value"])
        return st

    assert state(log) == state(src_plain) and len(state(log)) > 0


def test_start_replication_negotiates_v2_and_two_phase(tmp_path):
    """The tailer can REQUEST what the codec can decode: proto_version 2+
    with streaming/two_phase options in START_REPLICATION (the reference
    pins proto_version '1' and can request neither)."""
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv.start()
    tailer = WireReplicationTailer(
        "127.0.0.1",
        srv.port,
        USER,
        DB,
        "pub1",
        "slot1",
        str(tmp_path / "neg.log"),
        proto_version=3,
        streaming=True,
        two_phase=True,
        messages=True,
    )
    tailer.start()
    n = tailer.run()
    tailer.stop()
    srv.join(10)
    assert srv.error is None and n == len(frames)
    opts = srv.start_options[0]
    assert "proto_version '3'" in opts
    assert "streaming 'on'" in opts and "two_phase 'on'" in opts
    assert "messages 'on'" in opts


def test_two_phase_frames_over_the_wire(tmp_path):
    """Two-phase log over the socket: prepared spans with deferred
    out-of-order resolutions and a rolled-back poison tx ship through
    the tailer (unit-tracked dedup holds units open to 'K'/'r') and
    reassemble to the plain rendering's state."""
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer
    from pypgcdc_spark.testing import write_two_phase_cdc_pair

    src_plain = str(tmp_path / "plain.log")
    src_2pc = str(tmp_path / "twophase.log")
    rows = [((i * 5) % 13, "error" if i % 7 == 3 else f"ev{i % 3}", i * 1.5) for i in range(120)]
    write_two_phase_cdc_pair(src_plain, src_2pc, rows, chunk=20)
    frames = [(fr.lsn, fr.payload) for fr in scan_frames(src_2pc)]

    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv.start()
    log = str(tmp_path / "wire_2pc.log")
    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log,
        proto_version=3, streaming=True, two_phase=True,
    )
    tailer.start()
    n = tailer.run()
    tailer.stop()
    srv.join(10)
    assert srv.error is None and n == len(frames)
    assert [(fr.lsn, fr.payload) for fr in scan_frames(log)] == frames

    def state(path):
        x = MessageTransformer(registry=SchemaRegistry())
        evs = []
        for fr in scan_frames(path):
            evs.extend(x.feed(fr.lsn, fr.payload))
        evs.sort(key=lambda e: e.lsn)
        st = {}
        for ev in evs:
            k = ev.key["user_id"]
            if ev.op == "D":
                st.pop(k, None)
            else:
                st[k] = (ev.after["last_event"], ev.after["value"])
        return st

    assert state(log) == state(src_plain) and len(state(log)) > 0


def test_initial_sync_snapshot_plus_stream(tmp_path):
    """Consistent initial sync (reference S3) over the wire: create the
    slot (snapshot exported), COPY the table on a SECOND connection that
    imports that snapshot — while the replication connection streams —
    then apply the stream on top of the seed.  COPY text escapes (tab,
    newline, backslash, \\N NULL) must round-trip."""
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=False, max_conns=2)
    srv.copy_tables["integration"] = [
        ("1", '{"a": 1}', "5.00", None, "seed\trow"),
        ("2", None, "6.00", None, "line\nbreak \\ slash"),
    ]
    srv.start()
    log = str(tmp_path / "sync.log")
    tailer = WireReplicationTailer("127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log)
    tailer.start()  # slot missing -> created, snapshot name captured
    assert tailer.snapshot_name == "00000003-00000002-1"
    seed = tailer.initial_sync(
        "integration", ["id", "json_data", "amount", "updated_at", "text_data"]
    )
    assert seed == [
        ("1", '{"a": 1}', "5.00", None, "seed\trow"),
        ("2", None, "6.00", None, "line\nbreak \\ slash"),
    ]
    # the sync connection imported the slot's exported snapshot
    assert srv.imported_snapshots == [tailer.snapshot_name]
    n = tailer.run()
    tailer.stop()
    srv.join(10)
    assert srv.error is None and n == len(frames)

    # Seed + stream = final state: the reference workload inserts then
    # updates then deletes id 10, so only the seed rows survive.
    state = {r[0]: r for r in seed}
    x = MessageTransformer(registry=SchemaRegistry())
    for fr in scan_frames(log):
        for ev in x.feed(fr.lsn, fr.payload):
            if ev.table != "integration":
                continue
            k = ev.key["id"]
            if ev.op == "D":
                state.pop(k, None)
            else:
                state[k] = (
                    ev.after["id"],
                    ev.after["json_data"],
                    ev.after["amount"],
                    ev.after["updated_at"],
                    ev.after["text_data"],
                )
    assert sorted(state) == ["1", "2"]
    assert state["1"][4] == "seed\trow"


def test_initial_sync_spooled_chunked(tmp_path):
    """Distributed initial sync (VERDICT r5 #1): COPY bytes spool to
    rotating chunk files cut at row boundaries; driver memory stays
    bounded by chunk_bytes + one protocol message no matter how big the
    table is (the buffering here is PYTHON driver memory — the bound is
    asserted via the spool's observed peak, the process-level twin of a
    low --driver-memory run)."""
    srv = FakeWalsender(auth="trust", slot_exists=False, max_conns=2)
    n_rows = 20_000

    def big_table():
        for i in range(n_rows):
            yield (
                str(i),
                None if i % 7 == 0 else f'{{"v": {i}}}',
                f"{i}.25",
                None,
                f"t{i}\tx\\y\nz" if i % 5 == 0 else f"plain {i}",
            )

    srv.copy_tables["integration"] = big_table
    srv.start()
    log = str(tmp_path / "sync.log")
    tailer = WireReplicationTailer("127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log)
    tailer.start()  # slot missing -> created, snapshot exported
    chunk_bytes = 64 * 1024
    spool = tailer.initial_sync_to_spool(
        "integration",
        ["id", "json_data", "amount", "updated_at", "text_data"],
        str(tmp_path / "spool"),
        chunk_bytes=chunk_bytes,
    )
    tailer.stop()
    assert len(spool.paths) > 3  # genuinely chunked
    # Driver memory bound: chunk buffer + one protocol message of slack.
    assert spool.max_buffered <= chunk_bytes + 64 * 1024
    assert srv.imported_snapshots == [tailer.snapshot_name]

    # Every chunk ends on a row boundary and the concatenation parses to
    # exactly the table (same driver-side unescape the buffered path uses).
    from pypgcdc_spark.sources.pgwire import _copy_unescape

    got = []
    for p in spool.paths:
        data = open(p, "rb").read()
        assert data.endswith(b"\n")
        for line in data.decode().split("\n"):
            if line:
                got.append(tuple(_copy_unescape(v) for v in line.split("\t")))
    want = list(big_table())
    assert len(got) == n_rows
    assert got == [tuple(r) for r in want]


def test_snapshot_name_validation(tmp_path):
    """A malicious/corrupt exported snapshot name must never reach
    SET TRANSACTION SNAPSHOT string interpolation (SURVEY §7.4 Q8)."""
    from pypgcdc_spark.sources.pgwire import _validate_snapshot_name

    assert _validate_snapshot_name("00000003-00000002-1") == "00000003-00000002-1"
    for bad in ("snap'; DROP TABLE x; --", "a b", "", "snap\\x"):
        with pytest.raises(ProtocolError, match="snapshot name"):
            _validate_snapshot_name(bad)


# ---------------------------------------------------------------------------
# Round 6: TLS negotiation, genuine SCRAM-PLUS channel binding,
# reconnect-mid-COPY, two-phase reconnect fault injection
# ---------------------------------------------------------------------------


def _self_signed_server_ctx():
    """Self-signed server cert + ssl context (test-only; `cryptography`
    is available in this environment but is NOT an engine dependency)."""
    import datetime
    import ssl
    import tempfile

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=1))
        .sign(key, hashes.SHA256())
    )
    d = tempfile.mkdtemp(prefix="fakewals_tls_")
    cert_pem, key_pem = f"{d}/cert.pem", f"{d}/key.pem"
    with open(cert_pem, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_pem, "wb") as f:
        f.write(
            key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.TraditionalOpenSSL,
                serialization.NoEncryption(),
            )
        )
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_pem, key_pem)
    return ctx, cert.public_bytes(serialization.Encoding.DER)


def test_tls_refused_prefer_falls_back_require_fails(tmp_path):
    """SSLRequest against a server without TLS: 'N' answer — sslmode
    prefer proceeds plaintext, require raises."""
    srv = FakeWalsender(auth="trust", slot_exists=True, max_conns=2)
    srv.start()
    c = ReplicationClient("127.0.0.1", srv.port, USER, DB, sslmode="prefer")
    c.connect()
    assert not c._tls
    assert c.identify_system()["dbname"] == DB
    c.close()
    c2 = ReplicationClient("127.0.0.1", srv.port, USER, DB, sslmode="require")
    with pytest.raises(ProtocolError, match="refused TLS"):
        c2.connect()
    c2.close()


def test_tls_scram_plus_channel_binding_end_to_end(tmp_path):
    """Genuine SCRAM-SHA-256-PLUS over a real TLS socket: the client
    negotiates TLS, picks the -PLUS mechanism, and binds the exchange to
    the server certificate (tls-server-end-point); the server VERIFIES
    the binding; frames then stream over the encrypted socket."""
    ctx, der = _self_signed_server_ctx()
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(
        auth="scram", frames=frames, slot_exists=True, tls_ctx=ctx, cert_der=der
    )
    srv.start()
    log = str(tmp_path / "tls.log")
    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log,
        password=PASSWORD, sslmode="require",
    )
    tailer.start()
    n = tailer.run()
    tailer.stop()
    srv.join(10)
    assert srv.error is None
    assert srv.sasl_mechs == ["SCRAM-SHA-256-PLUS"]
    assert n == len(frames)
    assert [(fr.lsn, fr.payload) for fr in scan_frames(log)] == frames


def test_tls_scram_plus_rejects_wrong_binding(monkeypatch):
    """A client whose channel-binding data hashes a DIFFERENT certificate
    (the TLS-terminating-MITM model) must be rejected by the server even
    though the password is correct."""
    import pypgcdc_spark.sources.pgwire as pgwire_mod

    ctx, der = _self_signed_server_ctx()
    srv = FakeWalsender(auth="scram", slot_exists=True, tls_ctx=ctx, cert_der=der)
    srv.start()
    monkeypatch.setattr(
        pgwire_mod, "tls_server_end_point", lambda cert: b"\x00" * 32
    )
    c = ReplicationClient(
        "127.0.0.1", srv.port, USER, DB, PASSWORD, sslmode="require"
    )
    with pytest.raises(ProtocolError, match="auth|SASL"):
        c.connect()
    c.close()


def test_initial_sync_reconnect_mid_copy(tmp_path):
    """Initial sync interrupted mid-COPY (VERDICT r5 #5): the connection
    dies after 100 rows with no CopyDone; the tailer discards the partial
    spool and restarts the COPY on a fresh connection importing the SAME
    exported snapshot — the result is identical to an uninterrupted sync."""
    srv = FakeWalsender(
        auth="trust", slot_exists=False, max_conns=3, copy_drop_after=100
    )
    n_rows = 500
    srv.copy_tables["integration"] = lambda: (
        (str(i), f"v{i}" if i % 3 else None) for i in range(n_rows)
    )
    srv.start()
    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", str(tmp_path / "s.log")
    )
    tailer.start()  # slot created, snapshot exported
    spool = tailer.initial_sync_to_spool(
        "integration", ["id", "val"], str(tmp_path / "spool"),
        chunk_bytes=4096, max_retries=1,
    )
    tailer.stop()
    assert spool.retries == 1
    # BOTH sync connections imported the same exported snapshot.
    assert srv.imported_snapshots == [tailer.snapshot_name] * 2
    from pypgcdc_spark.sources.pgwire import _copy_unescape

    got = []
    for p in spool.paths:
        for line in open(p, "rb").read().decode().split("\n"):
            if line:
                got.append(tuple(_copy_unescape(v) for v in line.split("\t")))
    assert got == [(str(i), f"v{i}" if i % 3 else None) for i in range(n_rows)]


def _two_phase_unit_frames():
    """R, then one prepared tx: b .. DML .. P .. K (resolution)."""
    from datetime import datetime, timezone

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    relid = 21001
    cols = [(True, "id", 23, -1), (False, "v", 25, -1)]
    frames = [
        (100, pg.encode_relation(relid, "public", "t2pc", cols)),
        (110, pg.encode_begin_prepare(110, 130, ts, 777, "gid-x")),
        (120, pg.encode_insert(relid, ["1", "a"])),
        (130, pg.encode_prepare(110, 130, ts, 777, "gid-x")),
        (150, pg.encode_commit_prepared(150, 150, ts, 777, "gid-x")),
    ]
    return frames, ts, relid, cols


def _decode_log(log):
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    x = MessageTransformer(registry=SchemaRegistry())
    events = []
    for fr in scan_frames(log):
        events.extend(x.feed(fr.lsn, fr.payload))
    return events, x.stats


def test_two_phase_disconnect_between_prepare_and_commit(tmp_path):
    """Connection lost in the prepared window (after 'P', before 'K'):
    the open unit's buffered frames are discarded, the resend replays the
    whole b..P span, and the unit lands in the log exactly once when 'K'
    finally arrives."""
    frames, *_ = _two_phase_unit_frames()
    srv = FakeWalsender(
        auth="trust", frames=frames, slot_exists=True,
        drop_after=4, drop_partial=True, max_conns=2,  # dies before 'K'
    )
    srv.start()
    n, got, events, tailer, _ = _tail_and_decode(
        tmp_path, srv, max_reconnects=1, proto=3
    )
    assert tailer.reconnects == 1
    assert n == len(frames)
    assert got == frames
    assert [e.op for e in events] == ["I"]


def test_two_phase_duplicate_commit_prepared_after_reconnect(tmp_path):
    """A duplicate 'K' at the same LSN (replayed resolution) must be
    dropped by close-LSN membership — the transaction commits once."""
    frames, ts, relid, cols = _two_phase_unit_frames()
    dup = frames + [frames[-1]]  # second identical K
    srv = FakeWalsender(auth="trust", frames=dup, slot_exists=True)
    srv.start()
    n, got, events, tailer, xform = _tail_and_decode(
        tmp_path, srv, max_reconnects=0, proto=3
    )
    assert got == frames  # the duplicate K never reached the log
    assert [e.op for e in events] == ["I"]
    assert xform.stats.committed_prepared == 1


def test_two_phase_rollback_after_reconnect(tmp_path):
    """Disconnect in the prepared window, then the resolution is a
    ROLLBACK: the replayed b..P span buffers again and the whole unit
    (closed by 'r') lands once; the transform discards it — no events."""
    from datetime import datetime, timezone

    frames, ts, relid, cols = _two_phase_unit_frames()
    rb = frames[:-1] + [
        (150, pg.encode_rollback_prepared(130, 150, ts, ts, 777, "gid-x")),
        # a following plain tx proves the stream continues cleanly
        (210, pg.encode_begin(220, ts, 778)),
        (210, pg.encode_insert(relid, ["2", "b"])),
        (220, pg.encode_commit(220, 220, ts)),
    ]
    srv = FakeWalsender(
        auth="trust", frames=rb, slot_exists=True,
        drop_after=4, drop_partial=True, max_conns=2,
    )
    srv.start()
    n, got, events, tailer, xform = _tail_and_decode(
        tmp_path, srv, max_reconnects=1, proto=3
    )
    assert tailer.reconnects == 1
    assert got == rb
    assert [e.op for e in events] == ["I"]  # only the plain tx's insert
    assert events[0].after["id"] == "2"
    assert xform.stats.rolled_back_prepared == 1


def test_cross_run_resume_truncates_torn_tail_and_dedups(tmp_path):
    """A fresh run() over an existing log (process restart): run 1 stops
    mid-transaction via max_messages, flushing a TORN tail (the open
    unit's buffered prefix).  Run 2 — a brand-new tailer on the same log
    — must rebuild its close-LSN dedup window from the log and drop the
    torn tail before appending, so the full resend yields every frame
    exactly once; without the rebuild the torn prefix merges with the
    resent unit into one span with duplicated DML."""
    frames, src = _workload_frames(tmp_path)
    # Frames: R,R,(B,I,C),(B,U,C),(B,D,C),(B,I,C) — unit 1 closes at
    # index 4; max_messages=6 stops after buffering the next unit's 'B'.
    srv1 = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv1.start()
    log = str(tmp_path / "restart.log")
    t1 = WireReplicationTailer("127.0.0.1", srv1.port, USER, DB, "pub1", "slot1", log)
    t1.start()
    n1 = t1.run(max_messages=6)
    t1.stop()
    srv1.join(10)
    assert n1 == 6
    got1 = [(fr.lsn, fr.payload) for fr in scan_frames(log)]
    assert got1 == frames[:6]  # closed unit 1 + the torn 'B' tail

    # Restart: no ack was ever written, so the server resends everything.
    srv2 = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv2.start()
    t2 = WireReplicationTailer("127.0.0.1", srv2.port, USER, DB, "pub1", "slot1", log)
    t2.start()
    n2 = t2.run()
    t2.stop()
    srv2.join(10)
    assert srv2.error is None
    got2 = [(fr.lsn, fr.payload) for fr in scan_frames(log)]
    assert got2 == frames  # each frame exactly once, in order
    # Unit 1 was deduped (not re-appended), so run 2 counted only the rest.
    assert n2 == len(frames) - 5
    events, stats = _decode_log(log)
    assert [e.op for e in events] == ["I", "U", "D", "I"]


def test_cross_run_resume_seed_scan_starts_at_ack(tmp_path):
    """With an ack sidecar present, the restart's dedup-window rebuild
    scans only [ack pos, EOF) — units at/below the ack are never resent
    — and a resume from the acked LSN appends only the new units."""
    frames, src = _workload_frames(tmp_path)
    srv1 = FakeWalsender(auth="trust", frames=frames[:8], slot_exists=True)
    srv1.start()
    log = str(tmp_path / "ackseed.log")
    t1 = WireReplicationTailer("127.0.0.1", srv1.port, USER, DB, "pub1", "slot1", log)
    t1.start()
    n1 = t1.run()  # drains units 1-2 (8 frames), clean CopyDone
    t1.stop()
    srv1.join(10)
    assert n1 == 8
    fr_all = list(scan_frames(log))
    # Ack unit 1 (ends at frame index 4): its byte end is the scan start.
    with open(log + ".ack", "w") as f:
        json.dump({"pos": fr_all[4].end_pos, "lsn": fr_all[4].lsn}, f)

    # The restarted server resends from unit 2 on (resume LSN = ack).
    srv2 = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv2.start()
    t2 = WireReplicationTailer(
        "127.0.0.1", srv2.port, USER, DB, "pub1", "slot1", log,
        start_lsn=fr_all[4].lsn,
    )
    t2.start()
    n2 = t2.run()
    t2.stop()
    srv2.join(10)
    assert srv2.error is None
    got = [(fr.lsn, fr.payload) for fr in scan_frames(log)]
    assert got == frames  # unit 2's resend deduped, units 3-4 appended
    events, _ = _decode_log(log)
    assert [e.op for e in events] == ["I", "U", "D", "I"]


def test_replay_writer_truncate_drops_only_the_tail(tmp_path):
    """ReplayLogWriter.pos/truncate — the write-through tailer's drop
    mechanism: truncating back to a recorded position removes exactly
    the frames appended since, and appends continue cleanly after."""
    from pypgcdc_spark.sources.replay import ReplayLogWriter

    log = str(tmp_path / "t.log")
    w = ReplayLogWriter(log)
    w.append(10, b"AA")
    keep = w.pos
    w.append(20, b"BBB")
    w.append(30, b"C")
    w.truncate(keep)
    w.append(40, b"DD")
    w.close()
    assert [(fr.lsn, fr.payload) for fr in scan_frames(log)] == [
        (10, b"AA"),
        (40, b"DD"),
    ]
    # A reopened writer resumes at the true end.
    w2 = ReplayLogWriter(log)
    assert w2.pos == os.path.getsize(log)
    w2.close()


@pytest.mark.parametrize("drop_partial", [False, True])
def test_reconnect_dedup_sweep_every_drop_point(tmp_path, drop_partial):
    """Exhaustive fault sweep: the connection dies after EVERY possible
    frame index (optionally mid-message), the tailer reconnects, and the
    final log must equal the source frames exactly once at every drop
    point — closed units deduped by close-LSN, the partial unit
    truncated and replayed whole.  Uses a v2 log (interleaved streamed
    segments + plain txs between them) so drops land inside spans,
    between segments, and on unit boundaries."""
    from pypgcdc_spark.testing import write_streamed_cdc_pair

    src_plain = str(tmp_path / "p.log")
    src = str(tmp_path / "s.log")
    rows = [((i * 7) % 13, "error" if i % 11 == 5 else f"e{i % 4}", i * 0.5)
            for i in range(24)]
    write_streamed_cdc_pair(src_plain, src, rows, chunk=8)
    frames = [(fr.lsn, fr.payload) for fr in scan_frames(src)]

    for cut in range(1, len(frames), 4):  # sweep drop points, both modes
        srv = FakeWalsender(
            auth="trust", frames=frames, slot_exists=True,
            drop_after=cut, drop_partial=drop_partial, max_conns=2,
        )
        srv.start()
        log = str(tmp_path / f"sweep_{drop_partial}_{cut}.log")
        tailer = WireReplicationTailer(
            "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log,
            timeout=1.0,
        )
        tailer.start()
        n = tailer.run(max_reconnects=1)
        tailer.stop()
        srv.join(10)
        got = [(fr.lsn, fr.payload) for fr in scan_frames(log)]
        assert got == frames, f"drop at {cut} (partial={drop_partial}): log diverged"
        assert n == len(frames)


def test_tailer_memory_flat_through_a_huge_open_transaction(tmp_path):
    """The O(1)-memory claim, measured: 100k frames of ONE open (never
    committed) transaction stream through run() — write-through means
    Python heap growth stays flat (bounded well below the ~10 MB the
    frames occupy) while the log file absorbs every byte."""
    import gc
    import tracemalloc

    from pypgcdc_spark.cdc import pgoutput as pgc
    from pypgcdc_spark.sources.pgwire import WireReplicationTailer, XLogData

    n_frames = 100_000
    relid = 50001
    ins = pgc.encode_insert(relid, ["1", "x" * 80])  # ~100 B/frame

    class StubClient:
        """Duck-typed ReplicationClient: one huge open tx, then done."""

        def read_stream(self):
            yield XLogData(10, 10, 1_000_000, pgc.encode_relation(
                relid, "public", "big", [(True, "id", 23, -1), (False, "v", 25, -1)]
            ))
            yield XLogData(
                20, 20, 1_000_000, pgc.encode_begin(
                    99999999, __import__("datetime").datetime(
                        2024, 1, 1, tzinfo=__import__("datetime").timezone.utc
                    ), 777,
                )
            )
            for i in range(n_frames):
                yield XLogData(100 + i, 100 + i, 1_000_000, ins)
            # no commit: the unit stays open; clean CopyDone ends the run

        def send_standby_status(self, *a):
            pass

        def close(self):
            pass

    log = str(tmp_path / "huge.log")
    t = WireReplicationTailer("h", 1, "u", "d", "p", "s", log)
    t.client = StubClient()
    t._fresh_stream = True
    gc.collect()
    tracemalloc.start()
    base = tracemalloc.get_traced_memory()[0]
    n = t.run()
    peak = tracemalloc.get_traced_memory()[1]
    tracemalloc.stop()
    assert n == n_frames + 2
    payload_bytes = n_frames * len(ins)
    # Peak heap growth must be a small fraction of the streamed volume.
    assert peak - base < payload_bytes / 4, (peak - base, payload_bytes)
    # ...and the bytes all landed on disk (header 20B per frame).
    assert os.path.getsize(log) == (n_frames + 2) * 20 + 2 * 0 + sum(
        len(p) for p in (
            [ins] * n_frames
            + [pgc.encode_relation(relid, "public", "big",
                                   [(True, "id", 23, -1), (False, "v", 25, -1)])]
            + [pgc.encode_begin(99999999, __import__("datetime").datetime(
                2024, 1, 1, tzinfo=__import__("datetime").timezone.utc), 777)]
        )
    )


# -- PG version compatibility matrix (round-7 task 2) -----------------------
#
# The reference's own matrix is PG 12.9/13.6 (docker-compose.yaml:3-26);
# the live module here proves 15.18.  These tests close the gap for the
# versions no binaries exist for: the fake walsender emulates each
# server's pgoutput capability set with protocol-true errors, and pins
# BOTH halves of the story — clear failure when negotiation is off, and
# graceful downgrade (the real subscriber's walrcv_server_version clamp)
# when it is on.


def _version_tailer(tmp_path, srv, negotiate, log_name):
    return WireReplicationTailer(
        "127.0.0.1",
        srv.port,
        USER,
        DB,
        "pub1",
        "slot1",
        str(tmp_path / log_name),
        proto_version=3,
        streaming=True,
        two_phase=True,
        messages=True,
        binary=True,
        negotiate=negotiate,
    )


def test_pre14_server_rejects_v2_options_clearly(tmp_path):
    """negotiate=False against an emulated PG 13: the server's
    protocol-true rejection must surface unmasked (no retry loop, no
    slot side effects) — the 'clear failure' half of the story."""
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True, server_version="13.6")
    srv.start()
    t = _version_tailer(tmp_path, srv, negotiate=False, log_name="pg13_fail.log")
    with pytest.raises(ProtocolError, match="pgoutput option|proto_version"):
        t.start()
    t.stop()


def test_negotiation_downgrades_to_v1_for_pg13(tmp_path):
    """negotiate=True (default) against emulated PG 13: everything v2+
    is dropped, proto_version clamps to 1, and the stream WORKS — the
    graceful-downgrade half.  The downgrades are observable."""
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True, server_version="13.6")
    srv.start()
    log = str(tmp_path / "pg13_ok.log")
    t = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log,
        proto_version=3, streaming=True, two_phase=True, messages=True,
        binary=True,
    )
    t.start()
    n = t.run()
    t.stop()
    srv.join(10)
    assert srv.error is None
    assert n > 0
    opts = srv.start_options[-1]
    assert "proto_version '1'" in opts
    for feat in ("streaming", "two_phase", "messages", "binary"):
        assert feat not in opts
    assert set(t.downgraded) >= {"streaming", "two_phase", "messages", "binary"}
    assert t.server_major_version() == 13
    # The downgraded stream still decodes end-to-end.
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    xform = MessageTransformer(registry=SchemaRegistry())
    events = []
    for fr in scan_frames(log):
        events.extend(xform.feed(fr.lsn, fr.payload))
    assert [e.op for e in events] == ["I", "U", "D", "I"]


def test_negotiation_pg14_keeps_v2_drops_two_phase(tmp_path):
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True, server_version="14.11")
    srv.start()
    log = str(tmp_path / "pg14.log")
    t = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log,
        proto_version=3, streaming=True, two_phase=True, messages=True,
        binary=True,
    )
    t.start()
    assert t.run() > 0
    t.stop()
    srv.join(10)
    opts = srv.start_options[-1]
    assert "proto_version '2'" in opts
    assert "streaming 'on'" in opts
    assert "messages 'on'" in opts
    assert "binary 'true'" in opts or "binary 'on'" in opts
    assert "two_phase" not in opts
    assert t.downgraded == ["two_phase", "proto_version 3->2"]


def test_negotiation_pg15_two_phase_raises_proto_floor(tmp_path):
    """Requesting two_phase with proto_version=2 on PG 15 must clamp UP
    to proto 3 (the server rejects 2 + two_phase: 'need 3 or higher') —
    the exact footgun the round-7 soak hit on the live server."""
    frames, _ = _workload_frames(tmp_path)
    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True, server_version="15.18")
    srv.start()
    log = str(tmp_path / "pg15.log")
    t = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log,
        proto_version=2, streaming=True, two_phase=True,
    )
    t.start()
    assert t.run() > 0
    t.stop()
    srv.join(10)
    opts = srv.start_options[-1]
    assert "proto_version '3'" in opts
    assert "two_phase 'on'" in opts
    assert t.downgraded == []


def test_fake_server_enforces_protocol_true_errors(tmp_path):
    """The emulation itself: each rejected option produces pgoutput's
    actual error shape (verified wording against live PG 15, which
    rejected proto 2 + two_phase with 'need 3 or higher')."""
    srv = FakeWalsender(auth="trust", frames=[], slot_exists=True, server_version="13.6")
    assert "unrecognized pgoutput option: two_phase" == srv._start_options_error(
        "(proto_version '1', publication_names 'p', two_phase 'on')"
    )
    assert "we only support protocol 1 or lower" in srv._start_options_error(
        "(proto_version '2', publication_names 'p')"
    )
    srv15 = FakeWalsender(auth="trust", frames=[], slot_exists=True, server_version="15.18")
    assert "need 3 or higher" in srv15._start_options_error(
        "(proto_version '2', publication_names 'p', two_phase 'on')"
    )
    assert srv15._start_options_error(
        "(proto_version '3', publication_names 'p', two_phase 'on')"
    ) is None
    assert "need 2 or higher" in srv15._start_options_error(
        "(proto_version '1', publication_names 'p', streaming 'on')"
    )


# -- round 9: segmented replay log + retention GC (end-to-end) --------------


def test_tailer_segmented_retention_plateaus(tmp_path):
    """The r8 soak's unbounded-disk finding, closed at unit level: with
    ``segment_bytes`` set and consumer acks advancing, the tailer rolls
    closed units into archived segments and GCs them below the durable
    ack — the LOGICAL log keeps growing, the ON-DISK footprint plateaus
    (same watermark discipline as Postgres recycling WAL below the
    confirmed flush LSN).  Frame parity and the final retained suffix
    stay byte-exact throughout."""
    from pypgcdc_spark.sources.replay import (
        TxBoundaryScanner,
        list_segments,
        log_min_pos,
        log_size,
        tx_boundaries,
    )

    src = str(tmp_path / "src.log")
    write_upsert_workload(src, n_keys=40, n_updates=260)
    frames = [(fr.lsn, fr.payload) for fr in scan_frames(src)]
    assert len(frames) > 600

    srv = FakeWalsender(auth="trust", frames=frames, slot_exists=True)
    srv.start()
    log = str(tmp_path / "wire.log")
    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", log,
        segment_bytes=4096,
    )
    tailer.start()

    def disk_bytes():
        total = os.path.getsize(log) if os.path.exists(log) else 0
        return total + sum(
            os.path.getsize(fp) for _s, _e, fp in list_segments(log)
        )

    def last_closed():
        """(pos, lsn) of the last closed unit in the retained window."""
        scanner = TxBoundaryScanner()
        pos = lsn = 0
        for fr in scan_frames(log, log_min_pos(log), prefix_bytes=64):
            if scanner.feed(fr) is not None:
                pos, lsn = fr.end_pos, fr.lsn
        return pos, lsn

    got = 0
    disk_high = 0
    chunk = len(frames) // 4
    for phase in range(4):
        got += tailer.run(max_messages=chunk if phase < 3 else 0)
        disk_high = max(disk_high, disk_bytes())
        pos, lsn = last_closed()
        if lsn:
            with open(log + ".ack", "w") as f:
                json.dump({"pos": pos, "lsn": lsn}, f)
    tailer.stop()
    srv.join(10)
    assert srv.error is None
    assert got == len(frames)

    # The logical log is the whole feed; the disk held far less at any
    # point than the feed's total bytes (the plateau), and the final GC
    # (fired by the in-run ack poll) dropped everything below the ack.
    logical = log_size(log)
    assert logical == sum(20 + len(p) for _l, p in frames)
    assert disk_high < logical * 0.75, (disk_high, logical)
    final_ack = json.load(open(log + ".ack"))
    # One more pumped run is not available (feed done) — GC directly to
    # model the next ack-forward tick, then prove the retained window.
    from pypgcdc_spark.sources.replay import gc_segments

    gc_segments(log, final_ack["pos"])
    assert log_min_pos(log) <= final_ack["pos"]
    retained = disk_bytes()
    assert retained < logical * 0.35, (retained, logical)

    # Byte-exact retained suffix vs the source feed.
    min_pos = log_min_pos(log)
    tail_got = [(fr.lsn, fr.payload) for fr in scan_frames(log, min_pos)]
    # Source offsets: rebuild the plain log's frame positions.
    plain_frames = list(scan_frames(src))
    tail_want = [
        (fr.lsn, fr.payload) for fr in plain_frames if fr.start_pos >= min_pos
    ]
    assert tail_got == tail_want
    # And the boundaries in the retained window line up logically.
    assert tx_boundaries(log, min_pos) == [
        (s, e) for s, e in tx_boundaries(src) if s >= min_pos
    ]
