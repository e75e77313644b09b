/* golden_dump — JSON-lines dumper of libswish3 per-document records.
 *
 * Dev-only tool: links against the READ-ONLY reference sources at
 * /root/reference/src/libswish3 (see tools/build_reference.sh) and emits,
 * for each input document, one JSON object capturing the full
 * swish_ParserData record: docinfo, metanames/properties NamedBuffers
 * (base64 of the raw \x03-joined bytes), and the token list
 * (pos, meta, context, value, offset, len).
 *
 * These dumps are frozen into tests/goldens/*.jsonl and are the
 * byte-identity oracle for the Ray engine (BASELINE.json north_rule).
 *
 * This file is original code written for the swishray test harness; it
 * only calls the public API declared in libswish3.h.
 *
 * Usage: golden_dump [-c config.xml] [-t 0|1] file [file...]
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <getopt.h>
#include <libxml/hash.h>
#include <libxml/xmlstring.h>
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
print_json_str(const char *s)
{
    putchar('"');
    for (; s && *s; s++) {
        unsigned char c = (unsigned char)*s;
        if (c == '"' || c == '\\') { putchar('\\'); putchar(c); }
        else if (c < 0x20) printf("\\u%04x", c);
        else putchar(c);
    }
    putchar('"');
}

static int first_in_scan;

static void
dump_buffer_cb(void *payload, void *data, xmlChar *name)
{
    xmlBufferPtr buf = (xmlBufferPtr)payload;
    (void)data;
    if (!first_in_scan) putchar(',');
    first_in_scan = 0;
    print_json_str((const char *)name);
    putchar(':');
    putchar('"');
    print_b64(xmlBufferContent(buf), xmlBufferLength(buf));
    putchar('"');
}

static void
dump_nb(swish_NamedBuffer *nb, const char *label)
{
    printf("\"%s\":{", label);
    first_in_scan = 1;
    xmlHashScan(nb->hash, (xmlHashScanner)dump_buffer_cb, NULL);
    printf("}");
}

static void
handler(swish_ParserData *parser_data)
{
    swish_DocInfo *di = parser_data->docinfo;
    swish_Token *t;
    int first = 1;

    printf("{\"uri\":");
    print_json_str((const char *)di->uri);
    printf(",\"nwords\":%d", di->nwords);
    printf(",\"mime\":");
    print_json_str((const char *)di->mime);
    printf(",\"parser\":");
    print_json_str((const char *)di->parser);
    printf(",\"encoding\":");
    print_json_str((const char *)di->encoding);
    printf(",\"ext\":");
    print_json_str((const char *)di->ext);
    printf(",\"size\":%ld", (long)di->size);
    putchar(',');
    dump_nb(parser_data->metanames, "metanames");
    putchar(',');
    dump_nb(parser_data->properties, "properties");
    printf(",\"tokens\":[");
    if (parser_data->token_iterator) {
        while ((t = swish_token_iterator_next_token(parser_data->token_iterator))
               != NULL) {
            if (!first) putchar(',');
            first = 0;
            printf("[%u,", t->pos);
            print_json_str((const char *)t->meta->name);
            putchar(',');
            print_json_str((const char *)t->context);
            printf(",\"");
            print_b64((const unsigned char *)t->value, t->len);
            printf("\",%u,%u]", t->offset, t->len);
        }
    }
    printf("]}\n");
}

int
main(int argc, char **argv)
{
    int ch, i;
    swish_3 *s3;

    swish_setup();
    s3 = swish_3_init(&handler, NULL);

    while ((ch = getopt(argc, argv, "c:t:x:X:C:")) != -1) {
        switch (ch) {
        case 'c':
            s3->config = swish_config_add(s3->config, (xmlChar *)optarg);
            break;
        case 't':
            s3->analyzer->tokenize = swish_string_to_boolean((xmlChar *)optarg);
            break;
        case 'x':
            s3->config->flags->ignore_xmlns =
                swish_string_to_boolean((xmlChar *)optarg);
            break;
        case 'X':
            s3->config->flags->follow_xinclude =
                swish_string_to_boolean((xmlChar *)optarg);
            break;
        case 'C':
            s3->config->flags->cascade_meta_context =
                swish_string_to_boolean((xmlChar *)optarg);
            break;
        default:
            fprintf(stderr, "usage: golden_dump [-c conf] [-t 0|1] files\n");
            exit(1);
        }
    }
    for (i = optind; i < argc; i++) {
        if (argv[i][0] == '-' && !argv[i][1]) {
            /* Swish-e -S prog stdin protocol: Content-Length /
             * Content-Location / Content-Type / Parser-Type / Encoding
             * headers + body.  Lets goldens carry arbitrary uris. */
            swish_parse_fh(s3, NULL);
        }
        else if (swish_parse_file(s3, (xmlChar *)argv[i]) != 0)
            fprintf(stderr, "parse failed: %s\n", argv[i]);
    }
    s3->ref_cnt--;
    swish_3_free(s3);
    return 0;
}
