"""Golden tests for operators/fulltext.py::fulltext_url_tricks — one
row per publisher arm of the reference's extract_fulltext_url
(python/sandcrawler/html.py:17-343), hand-derived expectations, plus
the reference's own inline test_regex vectors (html.py:344-365) and
fall-through/no-match cases."""

from __future__ import annotations

from sandcrawler_spark.operators.fulltext import fulltext_url_tricks

SD_BOUNCE_BODY = """
window.onload = function () {
    window.location = 'https://pdf.sciencedirectassets.com/320270/AIP/1-s2.0-S2590109519300424/main.pdf?X-Amz-Date=20200110T210936Z&pii=S2590109519300424&type=client';
    refreshOriginalWindow();
}
"""

CASES = [
    # (name, url, html, pdf_url, next_url, release_stage, technique)
    (
        "researchsquare",
        "https://www.researchsquare.com/article/rs-123/v1",
        '{"url":"https://assets.researchsquare.com/files/4a57970e/v2/Manuscript.pdf"}',
        "https://assets.researchsquare.com/files/4a57970e/v2/Manuscript.pdf",
        None, "manuscript", "publisher",
    ),
    (
        "linkinghub",
        "https://linkinghub.elsevier.com/retrieve/pii/S1569199319308975",
        '<input type="hidden" name="redirectURL" value="http%3A%2F%2Fcysticfibrosisjournal.com%2Fretrieve%2Fpii%2FS1569199319308975" id="redirectURL"/>',
        None,
        "http://cysticfibrosisjournal.com/retrieve/pii/S1569199319308975",
        None, "elsevier-linkinghub",
    ),
    (
        "sciencedirect-json",
        "https://www.sciencedirect.com/science/article/pii/S0169204621000670",
        '<script type="application/json" data-iso-key="_0">{"article":{"pdfDownload":{"urlMetadata":{"pdfExtension":"/pdfft","queryParams":{"md5":"c4a83d06","pid":"1-s2.0-main.pdf"}}}}}</script>',
        "https://www.sciencedirect.com/science/article/pii/S0169204621000670/pdfft?md5=c4a83d06&pid=1-s2.0-main.pdf",
        None, None, "sciencedirect-munge-json",
    ),
    (
        # the reference's own test_regex bounce vector, trimmed
        "sciencedirect-bounce",
        "https://www.sciencedirect.com/science/article/pii/S2590109519300424/pdfft/main.pdf",
        SD_BOUNCE_BODY,
        "https://pdf.sciencedirectassets.com/320270/AIP/1-s2.0-S2590109519300424/main.pdf?X-Amz-Date=20200110T210936Z&pii=S2590109519300424&type=client",
        None, None, "sciencedirect-bounce",
    ),
    (
        "ieeexplore-document",
        "https://ieeexplore.ieee.org/document/8730316",
        '{"pdfPath":"/iel7/6287639/8600701/08730316.pdf",',
        "https://ieeexplore.ieee.org/iel7/6287639/8600701/08730316.pdf",
        None, "published", "ieeexplore",
    ),
    (
        "ieeexplore-stamp",
        "https://ieeexplore.ieee.org/stamp/stamp.jsp?arnumber=8730313",
        '<iframe src="http://web.archive.org/web/2019/https://ieeexplore.ieee.org/ielx7/08730313.pdf?tp=&amp;ref=" frameborder="0"></iframe>',
        # bs4 decodes &amp; in the src attribute; the port mirrors that
        "http://web.archive.org/web/2019/https://ieeexplore.ieee.org/ielx7/08730313.pdf?tp=&ref=",
        None, None, "iframe",
    ),
    (
        # the reference's own test_regex ovid vector
        "ovid",
        "https://insights.ovid.com/crossref?an=00042307-202001000-00013",
        '\n    blah\n    var journalURL = "https://journals.lww.com/co-urology/fulltext/10.1097/MOU.0000000000000689";\n    asdf',
        None,
        "https://journals.lww.com/co-urology/fulltext/10.1097/MOU.0000000000000689",
        None, "ovid",
    ),
    (
        "osf-short",
        "https://osf.io/8phvx",
        "whatever",
        None, "https://osf.io/8phvx/download", None, "osf-by-url",
    ),
    (
        "osf-preprints-trailing",
        "https://osf.io/preprints/socarxiv/8phvx/",
        "whatever",
        None, "https://osf.io/preprints/socarxiv/8phvx/download", None, "osf-by-url",
    ),
    (
        "wiley",
        "https://onlinelibrary.wiley.com/doi/pdf/10.1111/1467-923X.12787",
        'x /doi/pdfdirect/ y',
        None,
        "https://onlinelibrary.wiley.com/doi/pdfdirect/10.1111/1467-923X.12787",
        None, "wiley-pdfdirect",
    ),
    (
        "arxiv",
        "https://arxiv.org/abs/2001.00001",
        "",
        "https://arxiv.org/pdf/2001.00001", None, None, "arxiv-url",
    ),
    (
        "archivist-direct",
        "https://americanarchivist.org/doi/10.17723/aarc.62.2.j475",
        "",
        "https://americanarchivist.org/doi/pdf/10.17723/aarc.62.2.j475",
        None, None, "archivist-url",
    ),
    (
        "archivist-href",
        "https://americanarchivist.org/doi/abs-page/aarc.62",
        '<a href="/doi/pdf/10.17723/aarc.62.2.j475" target="_blank">PDF</a>',
        "https://americanarchivist.org/doi/pdf/10.17723/aarc.62.2.j475",
        None, None, "publisher-href",
    ),
    (
        "protocolsio",
        "https://www.protocols.io/view/flow-cytometry-protocol-mgdc3s6",
        "",
        "https://www.protocols.io/view/flow-cytometry-protocol-mgdc3s6.pdf",
        None, None, "protocolsio-url",
    ),
    (
        "degruyter",
        "https://www.degruyter.com/view/books/9783486594621/9783486594621-009/9783486594621-009.xml",
        "",
        "https://www.degruyter.com/downloadpdf/books/9783486594621/9783486594621-009/9783486594621-009.pdf",
        None, None, "degruyter-url",
    ),
    (
        "ahajournals",
        "https://www.ahajournals.org/doi/10.1161/circ.110.19.2977",
        '<a href="/doi/pdf/10.1161/circ.110.19.2977?download=true">PDF download</a>',
        "https://www.ahajournals.org/doi/pdf/10.1161/circ.110.19.2977?download=true",
        None, None, "ahajournals-url",
    ),
    (
        "ehp-full",
        "https://ehp.niehs.nih.gov/doi/full/10.1289/EHP4709",
        '<a href="/doi/pdf/10.1289/EHP4709" target="_blank">',
        "https://ehp.niehs.nih.gov/doi/pdf/10.1289/EHP4709",
        None, None, "ehp.niehs.nigh.gov-url",
    ),
    (
        "cogentoa",
        "https://www.cogentoa.com/article/10.1080/23311975.2017.1412873",
        "",
        "https://www.cogentoa.com/article/10.1080/23311975.2017.1412873.pdf",
        None, None, "cogentoa-url",
    ),
    (
        "figshare-json",
        "https://chemrxiv.org/articles/Biradical_Formation/10101419",
        '<script id="app-data" type="text/json">{"article":{"exportPdfDownloadUrl":"https://s3-eu-west-1.amazonaws.com/itempdf/10101419/v1.pdf"}}</script>',
        "https://s3-eu-west-1.amazonaws.com/itempdf/10101419/v1.pdf",
        None, None, "figshare-json",
    ),
    (
        "cnki",
        "http://en.gzbd.cnki.net/KCMS/detail/detail.aspx?FileName=HBGF202002003&DbName=GZBJ7920",
        '<a onclick="WriteKrsDownLog()" target="_blank" id="pdfDown" name="pdfDown" href="/gzbt/download.aspx?filename=4Q1Z&amp;tablename=GZBJLAST2020&amp;dflag=pdfdown&#xA;                      "><i></i>PDF Download</a>',
        "http://en.gzbd.cnki.net/gzbt/download.aspx?filename=4Q1Z&tablename=GZBJLAST2020&dflag=pdfdown",
        None, None, "cnki-href",
    ),
    (
        "rwth",
        "https://publications.rwth-aachen.de/record/801011",
        'see https://publications.rwth-aachen.de/record/801011/files/801011.pdf here',
        "https://publications.rwth-aachen.de/record/801011/files/801011.pdf",
        None, None, "rwth-aachen-url",
    ),
    (
        "physchemaspects",
        "http://physchemaspects.ru/2020/1/",
        '<a href="/files/art-7.pdf">download PDF file</a>',
        "http://physchemaspects.ru/files/art-7.pdf",
        None, None, "physchemaspects-href",
    ),
    (
        "ojs-galley",
        "https://journals.example.edu/index.php/j/article/view/44",
        '<meta name="generator" content="Open Journal Systems 3.1.2.1"/><a class="obj_galley_link file" href="/index.php/j/article/view/44/31">PDF</a>',
        "https://journals.example.edu/index.php/j/article/view/44/31",
        None, None, "ojs-galley-href",
    ),
    (
        "eperiodica",
        "https://www.e-periodica.ch/digbib/view?pid=brz-001:1931:2#471",
        'x https://www.e-periodica.ch/cntmng?pid=brz-001:1931:2 y',
        "https://www.e-periodica.ch/cntmng?pid=brz-001:1931:2",
        None, None, "href-eperiodica",
    ),
    (
        "jmir",
        "https://mhealth.jmir.org/2020/7/e17891/",
        "",
        "https://mhealth.jmir.org/2020/7/e17891/pdf",
        None, None, "jmir-url",
    ),
    (
        "google-drive",
        "https://drive.google.com/file/d/15DnbNMZTbRHHqKj8nFaikGSd1-OyoJ24/view",
        "",
        "https://drive.google.com/uc?export=download&id=15DnbNMZTbRHHqKj8nFaikGSd1-OyoJ24",
        None, None, "google-drive",
    ),
    (
        "docs-google-viewer",
        "https://docs.google.com/viewer?url=http://revistatyca.org.mx/index.php/tyca/libraryFiles/downloadPublic/150",
        "",
        "http://revistatyca.org.mx/index.php/tyca/libraryFiles/downloadPublic/150",
        None, None, "docs.google.com viewer",
    ),
    (
        "generic-guess",
        "https://repo.example.org/paper/77",
        'get it at <a href="https://repo.example.org/paper/77.pdf">here</a>',
        "https://repo.example.org/paper/77.pdf",
        None, None, "guess-url-plus-pdf",
    ),
    # the reference's own trivial vector: no arm fires
    ("no-match", "asdf", "asdf", None, None, None, None),
    # guard hits but regex misses and nothing downstream fires
    (
        "researchsquare-fallthrough",
        "https://www.researchsquare.com/article/rs-9/v1",
        "no json here",
        None, None, None, None,
    ),
]


def test_fulltext_url_tricks_goldens(spark):
    src = spark.createDataFrame(
        [(n, u, h) for n, u, h, *_ in CASES],
        "name string, url string, html string",
    )
    got = {
        r["name"]: (r.pdf_url, r.next_url, r.release_stage, r.technique)
        for r in fulltext_url_tricks(src).collect()
    }
    for name, _u, _h, pdf, nxt, stage, tech in CASES:
        assert got[name] == (pdf, nxt, stage, tech), name


def test_pdf_hop_decision(spark):
    """ingest_file.py:772-809 outcomes: biblio-preferred link, tricks
    link, blocked-wall vs no-pdf-link on empty extraction, link-loop
    against the hop chain, and the hops append on next-hop."""
    from sandcrawler_spark.operators.fulltext import pdf_hop_decision

    rows = [
        # biblio pdf wins over the arxiv trick arm
        ("biblio", "https://arxiv.org/abs/2001.1", "", "https://pub.example.org/1.pdf", []),
        # tricks arm fires (arxiv), not yet in hops -> next-hop
        ("trick", "https://arxiv.org/abs/2001.2", "", None, ["https://arxiv.org/abs/2001.2"]),
        # tricks link already in hops -> link-loop
        ("loop", "https://arxiv.org/abs/2001.3", "", None, ["https://arxiv.org/pdf/2001.3"]),
        # nothing found, wall substring in terminal URL -> blocked-wall
        ("wall", "https://x.org/login?TARGET=abc", "nope", None, []),
        # nothing found, no wall -> no-pdf-link
        ("nolink", "https://x.org/page", "nope", None, []),
    ]
    src = spark.createDataFrame(
        rows, "name string, url string, html string, biblio_pdf string, hops array<string>"
    )
    got = {
        r["name"]: (r.hop_status, r.hop_next_url, r.hop_technique, r.hops_out)
        for r in pdf_hop_decision(src, biblio_pdf_col="biblio_pdf").collect()
    }
    assert got["biblio"] == (
        "next-hop", "https://pub.example.org/1.pdf", "html_biblio",
        ["https://pub.example.org/1.pdf"],
    )
    assert got["trick"] == (
        "next-hop", "https://arxiv.org/pdf/2001.2", "arxiv-url",
        ["https://arxiv.org/abs/2001.2", "https://arxiv.org/pdf/2001.2"],
    )
    assert got["loop"] == (
        "link-loop", "https://arxiv.org/pdf/2001.3", "arxiv-url",
        ["https://arxiv.org/pdf/2001.3"],
    )
    assert got["wall"] == ("blocked-wall", None, None, [])
    assert got["nolink"] == ("no-pdf-link", None, None, [])
