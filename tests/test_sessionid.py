"""Session-id normalizer goldens.

The URL corpus is the reference's own embedded test corpus
(``SessionIDURLNormalizer.java:356-397``); expected outputs follow the
documented branch semantics (``:87-346``).
"""

from commoncrawl_ray.functions.sessionid import normalize_sessionid

# (input, expected) — expected == input means "no session id found".
CASES = [
    (
        "http://www.bearcountryuk.com/images/bc0059.jpg/osCsid/96a7bddc9c8a4249dbabd862f859e9e1",
        "http://www.bearcountryuk.com/images/bc0059.jpg",
    ),
    (
        "http://www.jileyes.com/lingerie_category-cat-26-name-Inseparables___ensembles__soutien_gorge-osCsid-3416a5c31a2013e37cf87ca963c6c99f.html",
        "http://www.jileyes.com/lingerie_category-cat-26-name-Inseparables___ensembles__soutien_gorge.html",
    ),
    (
        "http://www.didglobal.com/page/PHPSESSID/db2efa56f2d298cbed0f27be2574cbfe/home",
        "http://www.didglobal.com/page/home",
    ),
    (
        "http://www.tagtag.com/site/mobile/terms/PHPSESSID/a82av7cnicjak8t8gcq9ss8lg6",
        "http://www.tagtag.com/site/mobile/terms",
    ),
    (
        "http://www.minshuku-web.com/catalog/869/PHPSESSID/96bc0d2490b3ce6206d04c1ed7ccfb26.html",
        "http://www.minshuku-web.com/catalog/869.html",
    ),
    (
        "http://ifshinviolins.com/sessions/dd603a0a691faeb744db3f72212ca888/store",
        "http://ifshinviolins.com/store",
    ),
    (
        "http://www.iexplore.co.uk/travel-photos/French+Polynesia/1;$sessionid$BHZYH4QAAMGH5TBKYHVCFEQ",
        "http://www.iexplore.co.uk/travel-photos/French+Polynesia/1",
    ),
    (
        "http://www.reinke.com/index.html/session_id/d606e74935a60c04d9989082b2fb624d/screen/interesting_links",
        "http://www.reinke.com/index.html/screen/interesting_links",
    ),
    (
        "http://www.iboats.com/Portable_Above_Deck_Fuel_Tanks/dm/cart_id.726334728--category_id.238165--search_type.category--session_id.729524783--view_id.238165",
        "http://www.iboats.com/Portable_Above_Deck_Fuel_Tanks/dm/cart_id.726334728--category_id.238165--search_type.category--view_id.238165",
    ),
    (
        "http://www.bearcountryuk.com/index.php/cPath/50/teddy+bear+name/Accessories/osCsid/4d4b2659aa5f1a39d907d315cf0a5209",
        "http://www.bearcountryuk.com/index.php/cPath/50/teddy+bear+name/Accessories",
    ),
    (
        "http://www.bearcountryuk.com/index.ddd/cPath/50/teddy+bear+name/Accessories/osCsid/4d4b2659aa5f1a39d907d315cf0a5209",
        "http://www.bearcountryuk.com/index.ddd/cPath/50/teddy+bear+name/Accessories",
    ),
    (
        "http://www.bearcountryuk.com/index.ddd;jsessionid=08301521611089820628281",
        "http://www.bearcountryuk.com/index.ddd",
    ),
    (
        "http://www.myredpacket.co.uk/section.php/25/12/birthday-gifts-and-presents;JSESSIONID=08301521611089820628281",
        "http://www.myredpacket.co.uk/section.php/25/12/birthday-gifts-and-presents",
    ),
    (
        "http://www.placidway.com/treatment-detail/20/Orthopedic/Knee-Surgery-Treatment-Abroad//?PHPSESSID=c83e4440fdb325634206cda3482aa758",
        "http://www.placidway.com/treatment-detail/20/Orthopedic/Knee-Surgery-Treatment-Abroad//",
    ),
    (
        "http://boards.bootsnall.com/the-team.html?sid=f52964b93dcfeb6a9ba43b0caf44d752",
        "http://boards.bootsnall.com/the-team.html",
    ),
    (
        "http://www.trainpetdog.com/store/terms-of-use.php?osCsid=b27eecba862e5c723c05b2f4245c06ea",
        "http://www.trainpetdog.com/store/terms-of-use.php",
    ),
    (
        "http://www.emeraldinsight.com/Insight/menuNavigation.do;jsessionid=A17FC93E864C2F8B3709F63558BA69DB?hdAction=InsightHome",
        "http://www.emeraldinsight.com/Insight/menuNavigation.do?hdAction=InsightHome",
    ),
    # negatives: no recognized session token
    (
        "https://www.harrahs.com/AvailabilityCalendar.do?propCode=PLV",
        "https://www.harrahs.com/AvailabilityCalendar.do?propCode=PLV",
    ),
    (
        "http://www.google.com/search?hl=en&q=st+jude+hospital+fullerton&btnG=Google+Search",
        "http://www.google.com/search?hl=en&q=st+jude+hospital+fullerton&btnG=Google+Search",
    ),
    (
        "http://www.rainbowresource.com/prodlist.php?sid=1257592724-171162",
        "http://www.rainbowresource.com/prodlist.php?sid=1257592724-171162",
    ),
    (
        "http://www.motherwear.com/cs/sizechart.cfm?cid=107&sid=25046",
        "http://www.motherwear.com/cs/sizechart.cfm?cid=107&sid=25046",
    ),
    (
        "http://www.couponchief.com/coupons/submit?sid=4422",
        "http://www.couponchief.com/coupons/submit?sid=4422",
    ),
]


def test_sessionid_corpus():
    for url, want in CASES:
        assert normalize_sessionid(url) == want, url


def test_fnac_hexdash_36():
    # 36-char hex-with-dash id after ?SID= → stripped, rest of query kept
    url = "http://www.fnac.com/livre.asp?SID=2f3f0314-8164-f087-e7e9-4ed9487391c8&UID=0B3FF5542"
    out = normalize_sessionid(url)
    assert out == "http://www.fnac.com/livre.asp&UID=0B3FF5542"


def test_mozillazine_trailing_sid():
    url = "http://forums-test.mozillazine.org/memberlist.php?mode=viewprofile&u=261941&sid=dd4c61187cd950ad4b64b8e4da7c20a9"
    assert (
        normalize_sessionid(url)
        == "http://forums-test.mozillazine.org/memberlist.php?mode=viewprofile&u=261941"
    )


def test_idempotent_on_clean():
    clean = "http://example.com/a/b?x=1&y=2"
    assert normalize_sessionid(clean) == clean
