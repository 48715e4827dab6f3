"""Minimal digitally-born PDF generator for conversion tests.

Builds a structurally honest PDF (header, catalog, page tree, per-page
FlateDecode-able content streams, Info dict, xref, trailer) with text
drawn via Tj/Td operators — the common text-PDF shape
``extract_pdf_text`` targets.  Pure stdlib.
"""

from __future__ import annotations

import zlib


def _content_stream(lines: list[str]) -> bytes:
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        ops.append(f"({esc(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def make_pdf(
    pages: list[list[str]],
    title: str | None = None,
    compress: bool = False,
    image_only: bool = False,
    nested_parms: bool = False,
    tricky_literal: bool = False,
) -> bytes:
    """``pages``: list of pages, each a list of text lines.
    ``image_only=True`` swaps text operators for a raster-op stream —
    the scanned-PDF case that must stay ERR_CONVERSION_STUBBED.
    ``nested_parms=True`` adds a nested ``/DecodeParms << ... >>``
    dictionary to each compressed stream dict (a common real-PDF shape
    that breaks naive innermost-``<<`` dict location).
    ``tricky_literal=True`` adds a literal-string entry containing
    ``>>``/``<<`` tokens to each stream dict — legal PDF that
    unbalances any delimiter scan that doesn't skip string spans."""
    objs: list[bytes] = []

    def ref(n: int) -> str:
        return f"{n} 0 R"

    n_pages = len(pages)
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(ref(i) for i in page_obj_ids)

    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    info = f"<< /Title ({title}) >>" if title else "<< >>"
    objs.append(info.encode("latin-1"))  # 3

    for i, lines in enumerate(pages):
        pid, cid = 4 + 2 * i, 5 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {ref(cid)} >>"
            ).encode()
        )
        if image_only:
            body = b"q 612 0 0 792 0 0 cm /Im0 Do Q"
        else:
            body = _content_stream(lines)
        filt = b""
        if compress:
            body = zlib.compress(body)
            filt = b" /Filter /FlateDecode"
            if nested_parms:
                # Predictor 1 = no prediction; plain inflate still valid
                filt += b" /DecodeParms << /Predictor 1 /Columns 1 >>"
        if tricky_literal:
            # dict tokens AND an 'obj' substring inside a literal
            # string — must neither unbalance nor truncate the
            # outermost-dict scan
            filt += b" /Note (a >> b << my object \\) d)"
        objs.append(
            b"<< /Length " + str(len(body)).encode() + filt + b" >>\n"
            b"stream\n" + body + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R /Info 3 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_image_pdf(
    width: int,
    height: int,
    pixels: bytes,
    colorspace: str = "DeviceRGB",
    compress: bool = False,
    codec: str | None = None,
) -> bytes:
    """Minimal one-page PDF embedding a single image XObject with raw
    8-bit samples (optionally FlateDecode); ``codec='DCTDecode'``
    builds the not-hermetically-decodable shape instead."""
    body = pixels
    filt = b""
    if codec:
        filt = f" /Filter /{codec}".encode()
    elif compress:
        body = zlib.compress(body)
        filt = b" /Filter /FlateDecode"
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>",
        (
            f"<< /Type /XObject /Subtype /Image /Width {width} "
            f"/Height {height} /BitsPerComponent 8 /ColorSpace /{colorspace}"
        ).encode()
        + filt
        + b" /Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream",
        b"<< /Length 31 >>\nstream\nq 100 0 0 100 0 0 cm /Im0 Do Q\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obody in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obody + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def make_docx(
    paragraphs: list[str],
    title: str | None = None,
    page_breaks: int = 0,
) -> bytes:
    """Minimal OPC/WordprocessingML document (stdlib zipfile)."""
    import io
    import zipfile

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    body = []
    for i, p in enumerate(paragraphs):
        brk = (
            f'<w:r><w:br w:type="page"/></w:r>'
            if 0 < i <= page_breaks
            else ""
        )
        body.append(f"<w:p>{brk}<w:r><w:t>{esc(p)}</w:t></w:r></w:p>")
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W}"><w:body>{"".join(body)}</w:body></w:document>'
    )
    core = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties '
        'xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        + (f"<dc:title>{esc(title)}</dc:title>" if title else "")
        + "</cp:coreProperties>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types '
            'xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>',
        )
        z.writestr("word/document.xml", doc)
        z.writestr("docProps/core.xml", core)
    return buf.getvalue()
