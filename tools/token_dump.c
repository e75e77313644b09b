/* token_dump — run the reference tokenizer over stdin bytes, dump
 * one line per token: pos<TAB>offset<TAB>len<TAB>base64(value).
 * Dev-only oracle for swishray/tokenizer.py conformance tests. */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "libswish3.h"

static const char B64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

static void
print_b64(const unsigned char *data, int len)
{
    int i;
    for (i = 0; i < len; i += 3) {
        unsigned v = data[i] << 16;
        if (i + 1 < len) v |= data[i + 1] << 8;
        if (i + 2 < len) v |= data[i + 2];
        putchar(B64[(v >> 18) & 63]);
        putchar(B64[(v >> 12) & 63]);
        putchar(i + 1 < len ? B64[(v >> 6) & 63] : '=');
        putchar(i + 2 < len ? B64[v & 63] : '=');
    }
}

static void
handler(swish_ParserData *d) { (void)d; }

int
main(int argc, char **argv)
{
    swish_3 *s3;
    swish_TokenIterator *it;
    swish_MetaName *meta;
    swish_Token *t;
    unsigned char *buf;
    size_t cap = 1 << 20, n = 0, r;

    (void)argc; (void)argv;
    swish_setup();
    s3 = swish_3_init(&handler, NULL);
    buf = malloc(cap + 1);
    while ((r = fread(buf + n, 1, cap - n, stdin)) > 0) {
        n += r;
        if (n == cap) { cap *= 2; buf = realloc(buf, cap + 1); }
    }
    buf[n] = '\0';

    it = swish_token_iterator_init(s3->analyzer);
    meta = swish_hash_fetch(s3->config->metanames,
                            (xmlChar *)SWISH_DEFAULT_METANAME);
    swish_tokenize(it, (xmlChar *)buf, meta, (xmlChar *)SWISH_DEFAULT_METANAME);
    while ((t = swish_token_iterator_next_token(it)) != NULL) {
        printf("%u\t%u\t%u\t", t->pos, t->offset, t->len);
        print_b64((const unsigned char *)t->value, t->len);
        putchar('\n');
    }
    return 0;
}
