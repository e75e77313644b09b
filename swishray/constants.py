"""Engine constants mirroring the reference's public defines.

Citations are to /root/reference/src/libswish3/libswish3.h.
"""

# libswish3.h:119 — multiple values for one metaname/property are joined
# with this byte; during tokenization it bumps the position counter so
# phrases never match across block boundaries.
TOKENPOS_BUMPER = b"\x03"
BUMPER_CHR = "\x03"

# libswish3.h:42-43
MAX_WORD_LEN = 256
MIN_WORD_LEN = 1

# libswish3.h:83-86
DEFAULT_METANAME = "swishdefault"
TITLE_METANAME = "swishtitle"
TITLE_TAG = "title"
BODY_TAG = "body"

# libswish3.h:106-118 — built-in property names
PROP_DOCID = "swishfilenum"
PROP_DOCPATH = "swishdocpath"
PROP_DBFILE = "swishdbfile"
PROP_TITLE = "swishtitle"
PROP_SIZE = "swishdocsize"
PROP_MTIME = "swishlastmodified"
PROP_DESCRIPTION = "swishdescription"
PROP_MIME = "swishmime"
PROP_PARSER = "swishparser"
PROP_NWORDS = "swishwordnum"
PROP_ENCODING = "swishencoding"

# libswish3.h:102-104 — property types
PROP_TYPE_STRING = 1
PROP_TYPE_DATE = 2
PROP_TYPE_INT = 3

# libswish3.h:120-124
DOT = "."
DOM_CHAR = "/"
DOM_STR = "/"
XMLNS_CHAR = ":"

# libswish3.h:65-69
PARSER_TXT = "TXT"
PARSER_XML = "XML"
PARSER_HTML = "HTML"
DEFAULT_PARSER = "default"
DEFAULT_PARSER_TYPE = "HTML"

# libswish3.h:89, 192-193
DEFAULT_MIME = "text/html"
DEFAULT_ENCODING = "UTF-8"
LATIN1_ENCODING = "ISO8859-1"

# libswish3.h:177 — per-document size cap
MAX_FILE_LEN = 102_400_000

# config.c:183-202 — UndefinedMetaTags / UndefinedXMLAttributes policies
UNDEF_ERROR = "error"
UNDEF_IGNORE = "ignore"
UNDEF_INDEX = "index"
UNDEF_AUTO = "auto"
UNDEF_AUTOALL = "autoall"
UNDEF_DISABLE = "disable"

# libswish3.h:132-136, 140-153 — built-in ids
META_DEFAULT_ID = 0
META_TITLE_ID = 1
PROP_TITLE_ID = 3
PROP_DESCRIPTION_ID = 6
