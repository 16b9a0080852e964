"""Connector transposition: external-tool events -> memory rows (round-13).

Reference analog: ``services/connector_service.py:95``
``transpose_data_to_memory`` with its helpers at :13-93
(``remove_ts_fields``, ``flatten_dict``, ``clean_body_data``,
``process_metadata``).  The reference receives one webhook event at a
time (Slack messages / Linear issues, projects, comments, users) and
transposes it into a memory item ``{content, type, metadata}``; the
Spark engine runs the SAME deterministic mapping as one scan-side Arrow
kernel over ``{url, payload-JSON}`` event tables — connector exports
are batch/stream tables here, not webhooks, and the mapping is
embarrassingly parallel (zero shuffle, composes with the S7 batch-add
path downstream).

Faithful semantics (each rule cited to the reference line):

- ``remove_ts_fields`` (:13): every dict key CONTAINING ``ts`` (plain
  substring — ``created_ts``, ``counts``, ``ts`` all match) is dropped,
  recursively through dicts and lists.
- ``flatten_dict`` (:21): nested dicts collapse to ``_``-joined keys;
  lists are left as values.
- ``clean_body_data`` (:31): Linear comment ``bodyData`` rich-text JSON
  (``content`` paragraphs of ``content`` runs) joins the run texts with
  a single space; unparseable input passes through unchanged.
- ``process_metadata`` (:40): ``id`` renames to ``<connector>_id``,
  ``connector`` is stamped, ``None`` values drop, the dict flattens,
  excluded keys skip (defaults :53), scalars and all-string lists pass,
  anything else stringifies via ``str()``.
- ``transpose_event`` (:95): connector = 4th ``/``-segment of the url;
  routing by url substring — linear issues/projects/comments/users,
  slack message vs ``messageList`` (texts joined with ``' ||| '``,
  empty texts skipped but per-message ids still collected :196-226),
  generic fallback (:280).  Slack update events reproduce the
  reference's mutation order EXACTLY, including the quirk that a
  blocks-bearing ``message`` dict is deleted wholesale after its
  ``block_id`` promotion (:252-254) so neither survives into metadata.

Engine deviations (documented, deterministic):

- ``workspace_id`` is an input column (the reference resolves it from
  the tenant via Parse Server :119 — service plumbing, not mapping).
- ``acl_object_ids`` for Slack is the sorted distinct member list (the
  reference maps member handles to stored user object-ids and dedups
  via ``list(set(...))`` :186-190 — an unordered set; the engine keeps
  the handles, sorted so output is deterministic, and callers join
  their own identity table).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

#: the reference's content delimiter for messageList events (:127)
CONTENT_DELIMITER = " ||| "

#: default excluded metadata keys (:53)
DEFAULT_EXCLUDED = ("sessionToken", "text", "blocks", "messages")

#: the wider exclusion used for the general-metadata pass (:293)
GENERAL_EXCLUDED = ("sessionToken", "text", "blocks", "messages", "members")


def remove_ts_fields(obj):
    """Recursively drop dict keys containing ``ts`` (substring match —
    connector_service.py:13)."""
    if isinstance(obj, dict):
        return {k: remove_ts_fields(v) for k, v in obj.items()
                if "ts" not in k}
    if isinstance(obj, list):
        return [remove_ts_fields(v) for v in obj]
    return obj


def flatten_dict(d: dict, parent: str = "", sep: str = "_") -> dict:
    """``{"a": {"b": 1}} -> {"a_b": 1}`` (connector_service.py:21);
    lists stay values."""
    out = {}
    for k, v in d.items():
        key = f"{parent}{sep}{k}" if parent else k
        if isinstance(v, dict):
            out.update(flatten_dict(v, key, sep))
        else:
            out[key] = v
    return out


def clean_body_data(body_data):
    """Linear rich-text ``bodyData`` -> plain text (:31): join every
    ``text`` run of every ``content`` paragraph with spaces; anything
    unparseable passes through."""
    try:
        body = json.loads(body_data)
        return " ".join(run["text"] for para in body["content"]
                        for run in para["content"] if "text" in run)
    except (json.JSONDecodeError, KeyError, TypeError):
        return body_data


def process_metadata(metadata: dict, connector: str,
                     excluded_keys=None) -> dict:
    """The reference's metadata scrub (:40-93): id rename, connector
    stamp, None-drop, flatten, exclusion, scalar/str-list passthrough,
    ``str()`` for the rest."""
    if excluded_keys is None:
        excluded_keys = list(DEFAULT_EXCLUDED)
    metadata = dict(metadata)
    if "id" in metadata:
        metadata[f"{connector}_id"] = metadata.pop("id")
    if connector:
        metadata["connector"] = connector
    metadata = {k: v for k, v in metadata.items() if v is not None}
    flat = flatten_dict(metadata)
    out = {}
    for k, v in flat.items():
        if k in excluded_keys:
            continue
        if isinstance(v, (str, int, float, bool)):
            out[k] = v
        elif isinstance(v, list) and all(isinstance(i, str) for i in v):
            out[k] = v
        else:
            out[k] = str(v)
    return {k: v for k, v in out.items() if v is not None}


def transpose_event(input_data: dict, url: str,
                    workspace_id: str | None = None,
                    update: bool = False) -> dict:
    """One event -> ``{content, type, metadata}``
    (connector_service.py:95, minus the Parse/ACL service calls — see
    module-docstring deviations).  Raises ``ValueError`` for a Slack
    message without text, like the reference (:266)."""
    input_data = dict(input_data)
    connector = url.split("/")[3] if len(url.split("/")) > 3 else ""
    memory_type = "text"
    hierarchical = ""
    source_type = ""
    content = ""
    source_urls: list[str] = []
    acl_object_ids: list[str] = []
    is_private = input_data.get("is_private", True)
    authed_user_id = input_data.get("authed_user_id")

    members_raw = input_data.get("members", [])
    if isinstance(members_raw, list):
        members = members_raw
    elif isinstance(members_raw, str):
        members = members_raw.split(",")
    else:
        members = []

    specific: dict = {}
    if "/linear/issues" in url:
        memory_type = "issue"
        source_type = "linear"
        hierarchical = (f"{input_data.get('project', {}).get('name', '')}"
                        ", Issues")
        content = input_data["title"]
    elif "/linear/projects" in url:
        source_type = "linear"
        hierarchical = f"{input_data.get('name', '')}, Projects"
        milestones = input_data.get("projectMilestones")
        content = (f"Project: {input_data['name']}\n"
                   f"Milestones: {milestones}")
        input_data["projectMilestones"] = milestones
    elif "/linear/comments" in url:
        source_type = "linear"
        hierarchical = "Comments"
        content = clean_body_data(
            input_data.get("bodyData", input_data.get("body", "")))
    elif "/linear/users" in url:
        source_type = "linear"
        hierarchical = "Users"
        content = (f"User: {input_data['displayName']} "
                   f"({input_data['email']})")
    elif "/slack/messages" in url:
        hierarchical = "Slack Message"
        source_type = "slack"
        if connector == "slack" and members:
            # engine analog of find_user_by_connector_ids + list(set())
            # (:186-190): sorted distinct handles (deterministic)
            acl_object_ids = sorted(set(members))
        if input_data.get("type") == "messageList":
            texts, user_ids, client_msg_ids = [], [], []
            for msg in input_data.get("messages", []):
                text = msg.get("text", "")
                if text:
                    texts.append(text)
                user_ids.append(msg.get("user", ""))
                client_msg_ids.append(msg.get("client_msg_id", ""))
                source_urls.append(msg.get("sourceUrl", ""))
            content = CONTENT_DELIMITER.join(texts)
            specific = process_metadata({
                "type": input_data.get("type"),
                "members": members,
                "authed_user_id": authed_user_id,
                "user_ids": user_ids,
                "client_msg_ids": client_msg_ids,
                "source_urls": source_urls,
                "sourceUrl": source_urls[0] if source_urls else "",
                "workspace_id": workspace_id,
            }, connector)
        else:
            source_urls.append(input_data.get("sourceUrl", ""))
            if update:
                content = f"{input_data['message']['text']} (edited)"
                msg = input_data.get("message", {})
                if "blocks" in msg and len(msg["blocks"]) > 0:
                    # the reference promotes block_id INTO the message
                    # dict and then deletes the whole dict (:252-254) —
                    # neither survives; reproduced verbatim
                    msg["block_id"] = msg["blocks"][0].get("block_id")
                    del input_data["message"]
                prev = input_data.get("previous_message", {})
                if "blocks" in prev and len(prev["blocks"]) > 0:
                    del prev["blocks"]
                client_msg_id = input_data.get("message", {}) \
                    .get("client_msg_id")
                if client_msg_id:
                    input_data["client_msg_id"] = client_msg_id
            else:
                content = input_data.get("text")
                if not content:
                    raise ValueError(
                        "No text content found in Slack message")
                if "blocks" in input_data and len(input_data["blocks"]) > 0:
                    input_data["block_id"] = \
                        input_data["blocks"][0].get("block_id")
                    del input_data["blocks"]
            specific = process_metadata({
                "client_msg_id": input_data.get("client_msg_id"),
                "sourceUrl": source_urls[0] if source_urls else "",
                "workspace_id": workspace_id,
            }, connector)
    else:
        content = input_data.get("content")
        hierarchical = input_data.get("project", {}).get("name", "")

    input_data = remove_ts_fields(input_data)
    general = process_metadata(input_data, connector,
                               excluded_keys=list(GENERAL_EXCLUDED))
    supported = {**general, **specific}
    final_metadata = {
        "hierarchical structures": hierarchical,
        "sourceType": source_type,
        "sourceUrl": source_urls[0] if source_urls else "",
        "workspace_id": workspace_id,
        "acl_object_ids": acl_object_ids,
        "is_private": is_private,
        **supported,
    }
    return {"content": content, "type": memory_type,
            "metadata": final_metadata}


TRANSPOSE_SCHEMA = (
    "url string, connector string, memory_type string, content string, "
    "source_type string, hierarchical_structures string, "
    "source_url string, workspace_id string, is_private boolean, "
    "acl_object_ids array<string>, metadata_json string, error string")


def transpose_connector_events(events: DataFrame, url_col: str = "url",
                               payload_col: str = "payload",
                               workspace_col: str | None = None,
                               update: bool = False,
                               passthrough: dict[str, str] | None = None
                               ) -> DataFrame:
    """Batch transpose: ``{url, payload(JSON string)[, workspace_id]}``
    events -> one memory row each.  ``metadata_json`` is the final
    metadata dict as canonical JSON (sorted keys) — joinable, hashable,
    and the downstream S7 add path reads it as customMetadata.  Rows the
    reference would reject (e.g. a Slack message without text) surface
    in ``error`` with NULL content — decode-tolerant like every binary
    source here, but never silently wrong.

    ``passthrough`` ({column: spark-type} of input columns copied
    verbatim onto each output row) keys the output back to its source
    row — urls repeat per connector, so callers with their own event
    ids thread them through here instead of joining on a non-key.

    Shape: one mapInPandas Arrow kernel, scan-side, zero shuffle; at
    100 TB the mapping runs where the event partitions already live."""
    import pandas as pd

    pt = dict(passthrough or {})

    def kernel(batches):
        for pdf in batches:
            rows = []
            cols = list(pt) + [url_col, payload_col] + (
                [workspace_col] if workspace_col else [])
            for vals in zip(*(pdf[c] for c in cols)):
                keyed = tuple(vals[:len(pt)])
                url = str(vals[len(pt)])
                payload_val = vals[len(pt) + 1]
                ws = (str(vals[-1]) if workspace_col is not None
                      and vals[-1] is not None else None)
                try:
                    data = json.loads(payload_val)
                    item = transpose_event(data, url, ws, update=update)
                    meta = item["metadata"]
                    rows.append(keyed + (
                        url, url.split("/")[3] if len(url.split("/")) > 3
                        else "", item["type"], item["content"],
                        meta["sourceType"],
                        meta["hierarchical structures"],
                        meta["sourceUrl"], meta["workspace_id"],
                        bool(meta["is_private"]),
                        list(meta["acl_object_ids"]),
                        json.dumps(meta, sort_keys=True,
                                   ensure_ascii=False, default=str),
                        None))
                except Exception as e:  # noqa: BLE001 — loud per-row
                    rows.append(keyed + (url, None, None, None, None,
                                         None, None, None, None, None,
                                         None,
                                         f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=list(pt) + [
                "url", "connector", "memory_type", "content",
                "source_type", "hierarchical_structures", "source_url",
                "workspace_id", "is_private", "acl_object_ids",
                "metadata_json", "error"])

    cols = list(pt) + [url_col, payload_col] + (
        [workspace_col] if workspace_col else [])
    schema = "".join(f"{c} {t}, " for c, t in pt.items()) + TRANSPOSE_SCHEMA
    return events.select(*cols).mapInPandas(kernel, schema)
